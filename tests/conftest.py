"""Test harness config: force an 8-virtual-device CPU backend so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §7 test strategy).

NOTE (this environment): the axon TPU plugin ignores JAX_PLATFORMS and
the xla_force_host_platform_device_count XLA flag; the working recipe
on JAX 0.9 is jax_num_cpu_devices + jax_default_device='cpu'.
"""

import jax

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_device", "cpu")
