"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests exercise a multi-device mesh without TPU hardware."""

import os

# The environment pins JAX_PLATFORMS=axon (TPU tunnel); tests must hard-force
# the CPU backend BEFORE jax import or every op round-trips to the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax and pins the TPU backend at interpreter
# startup; the env var alone is ignored by then. The config update switches
# the default backend back to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# This machine has a single CPU core; persist compiled executables across
# test runs so XLA compile time is paid once.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
