"""Test configuration: CPU backend, 8 virtual devices, float64.

Multi-device sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), the standard JAX analogue of
multi-node testing without a TPU pod (SURVEY.md section 4).
"""

import os

# force CPU: the ambient environment pins JAX_PLATFORMS=axon (remote TPU),
# which would send every test compile through the TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

import jax

# belt and braces: under pytest the env var alone has been observed not to
# take effect (plugin import order), so force the platform via config too
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")
