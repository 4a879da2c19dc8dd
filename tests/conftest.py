"""Test harness config: force an 8-virtual-device CPU backend so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §7 test strategy).

NOTE (this environment): the axon TPU plugin ignores the JAX_PLATFORMS
env var and xla_force_host_platform_device_count; the working recipe
on JAX 0.9 is jax_num_cpu_devices + jax_default_device='cpu', PLUS
jax_platforms='cpu' set in-process BEFORE any backend initializes —
that last one stops device enumeration from creating the axon backend
at all, which otherwise blocks the whole suite forever whenever the
TPU tunnel wedges (observed 6+ hour wedges; see BASELINE.md).
"""

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass  # backends already up (e.g. conftest re-imported)
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_device", "cpu")
