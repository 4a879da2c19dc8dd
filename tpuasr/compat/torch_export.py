"""Export tpuasr checkpoints as reference-family torch ``.pth`` packages.

The inverse of ``tpuasr.compat.torch_import``: a tpuasr-trained model
becomes a ``DeepSpeech.serialize()``-shaped package (ref:model.py,
SURVEY.md §5.4) loadable by the reference's ``load_model_package`` —
so migration works in BOTH directions (import_torch_state_dict docs
list the layout conventions; this module applies them in reverse).
"""

from __future__ import annotations

import numpy as np

from tpuasr.model.ds2 import ModelConfig, conv_out_features


def _inv_perm(cfg: ModelConfig) -> np.ndarray:
    """Inverse of the import path's conv-flattening row permutation:
    torch flattens channel-major (c*F'+f), tpuasr feature-major
    (f*C+c)."""
    ch = cfg.conv_channels
    f_out = conv_out_features(cfg.n_features, ch) // ch
    perm = np.array(
        [c * f_out + f for f in range(f_out) for c in range(ch)], np.int64
    )
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv


def export_torch_state_dict(variables: dict, cfg: ModelConfig) -> dict:
    """{"params", "batch_stats"} -> torch-key state_dict of float32
    numpy arrays (plus int64 num_batches_tracked zeros so
    ``load_state_dict(strict=True)`` accepts it)."""
    p = variables["params"]
    s = variables["batch_stats"]
    f32 = lambda x: np.asarray(x, np.float32)  # noqa: E731
    out: dict = {}

    def put_bn(prefix, bn_p, bn_s):
        out[f"{prefix}.weight"] = f32(bn_p["scale"])
        out[f"{prefix}.bias"] = f32(bn_p["bias"])
        out[f"{prefix}.running_mean"] = f32(bn_s["mean"])
        out[f"{prefix}.running_var"] = f32(bn_s["var"])
        out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)

    # ---- conv stack ----
    for i, conv_idx in enumerate((0, 3)):
        k = f32(p[f"conv{i}"]["Conv_0"]["kernel"])  # (kT, kF, in, out)
        out[f"conv.seq_module.{conv_idx}.weight"] = k.transpose(3, 2, 1, 0)
        put_bn(f"conv.seq_module.{conv_idx + 1}",
               p[f"conv{i}"]["MaskedBatchNorm_0"],
               s[f"conv{i}"]["MaskedBatchNorm_0"])

    inv = _inv_perm(cfg)

    def unfix_l0(w_ours, layer):  # (H_in, G*H) rows back to torch order
        return w_ours[inv] if layer == 0 else w_ours

    # ---- recurrent stack ----
    for i in range(cfg.hidden_layers):
        lp = p[f"rnn{i}"]
        if "MaskedBatchNorm_0" in lp:
            put_bn(f"rnns.{i}.batch_norm.module", lp["MaskedBatchNorm_0"],
                   s[f"rnn{i}"]["MaskedBatchNorm_0"])
        if cfg.bidirectional:
            bi = lp["bi"]
            for d, suffix in enumerate(("", "_reverse")):
                out[f"rnns.{i}.rnn.weight_ih_l0{suffix}"] = unfix_l0(
                    f32(bi["input_kernel"][d]), i
                ).T
                out[f"rnns.{i}.rnn.weight_hh_l0{suffix}"] = f32(
                    bi["recurrent_kernel"][d]
                ).T
                out[f"rnns.{i}.rnn.bias_ih_l0{suffix}"] = f32(
                    bi["input_bias"][d]
                )
                out[f"rnns.{i}.rnn.bias_hh_l0{suffix}"] = f32(
                    bi["recurrent_bias"][d]
                )
        else:
            fwd = lp["fwd"]
            out[f"rnns.{i}.rnn.weight_ih_l0"] = unfix_l0(
                f32(fwd["input_proj"]["kernel"]), i
            ).T
            out[f"rnns.{i}.rnn.bias_ih_l0"] = f32(fwd["input_proj"]["bias"])
            out[f"rnns.{i}.rnn.weight_hh_l0"] = f32(
                fwd["recurrent_kernel"]
            ).T
            out[f"rnns.{i}.rnn.bias_hh_l0"] = f32(fwd["recurrent_bias"])

    if not cfg.bidirectional and "lookahead" in p:
        k = f32(p["lookahead"]["Conv_0"]["kernel"])  # (K, 1, H)
        out["lookahead.0.weight"] = k.transpose(2, 1, 0)

    # ---- head ----
    put_bn("fc.0.module.0", p["head_bn"], s["head_bn"])
    out["fc.0.module.1.weight"] = f32(p["head"]["kernel"]).T
    return out


def save_torch_package(pkg, path: str) -> None:
    """tpuasr CheckpointPackage -> reference-family ``.pth`` file
    (torch tensors; hyperparams + labels + audio_conf + histories)."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v).copy())
        for k, v in export_torch_state_dict(
            pkg.variables, pkg.model_config
        ).items()
    }
    fc = pkg.frontend_config
    torch.save({
        "hidden_size": pkg.model_config.hidden_size,
        "hidden_layers": pkg.model_config.hidden_layers,
        "rnn_type": pkg.model_config.rnn_type,
        "bidirectional": pkg.model_config.bidirectional,
        "labels": list(pkg.labels),
        "audio_conf": {
            "sample_rate": fc.sample_rate,
            "window_size": fc.window_size,
            "window_stride": fc.window_stride,
            "window": fc.window,
        },
        "state_dict": sd,
        "epoch": pkg.epoch,
        "loss_results": list(pkg.loss_history),
        "wer_results": list(pkg.wer_history),
        "cer_results": list(pkg.cer_history),
    }, path)


def main(argv=None) -> int:
    import argparse

    from tpuasr.train.checkpoint import load_checkpoint

    p = argparse.ArgumentParser(
        description="export a .tpuasr checkpoint as a reference-family "
        ".pth package"
    )
    p.add_argument("checkpoint")
    p.add_argument("out_pth")
    args = p.parse_args(argv)
    save_torch_package(load_checkpoint(args.checkpoint), args.out_pth)
    print(f"wrote {args.out_pth}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
