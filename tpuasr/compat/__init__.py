from tpuasr.compat.torch_import import import_torch_state_dict  # noqa: F401


def __getattr__(name):
    # torch_export pulls in torch at save time only; keep the package
    # import light for the common (JAX-only) paths
    if name in ("export_torch_state_dict", "save_torch_package"):
        from tpuasr.compat import torch_export

        return getattr(torch_export, name)
    if name == "load_torch_package":
        from tpuasr.compat.torch_import import load_torch_package

        return load_torch_package
    raise AttributeError(name)
