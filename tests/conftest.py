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
# Host-keyed subdir: XLA:CPU AOT cache entries are machine-code specialised
# to the compiling host's CPU features, and loading a foreign host's entry
# can compute silently WRONG results (measured: halo-sharded fields 11% off
# through a foreign cache; utils/io.host_cache_key docstring).
from alifmm_tpu.utils.io import host_cache_key  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    f"/root/repo/.jax_cache/host-{host_cache_key()}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
