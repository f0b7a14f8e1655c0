"""Test configuration: run JAX on a virtual 8-device CPU platform so
multi-chip sharding tests work without TPU hardware, and enable x64 so
golden comparisons against the float64 reference are not precision-limited.

Note: the environment pre-sets JAX_PLATFORMS to the TPU tunnel, so this must
*overwrite* (not setdefault) before jax initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# jax may already be imported by a pytest plugin before this conftest runs;
# the config route still works as long as no backend has been initialised.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compilation cache: the solver's sweep bodies are large and the
# first compile is minutes on CPU; subsequent test runs hit the disk cache.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
