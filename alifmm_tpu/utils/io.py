"""Saving / resuming of fields and ray results.

The reference's nearest analogs are the ``low_mem`` per-field spill
(temp_TTF_{i}.npy, Anis_TTF_rays.py:3611-3615) and the weld example's
final np.save calls (Weld_rays.py:69-72); both conventions are kept, plus
a bundled checkpoint so long transducer-array jobs can resume.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["save_fields", "load_fields", "save_rays", "load_rays",
           "enable_compile_cache", "host_cache_key"]


def host_cache_key() -> str:
    """Short fingerprint of this host's CPU feature set.

    XLA:CPU persistent-cache entries embed AOT machine code specialised
    to the *compiling* host's CPU features, but jax's cache key does not
    include those features: a cache written on one machine can be loaded
    on another where XLA only warns ("Machine type used for XLA:CPU
    compilation doesn't match... could lead to execution errors such as
    SIGILL") and may then compute silently wrong results.  Measured here:
    a halo-sharded solve read through a foreign cache came out up to 11%
    off the identical freshly-compiled program (bench_data/diag_halo.py
    history).  Keying the cache *directory* by the CPU feature set makes
    entries host-compatible by construction.
    """
    import glob
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        model = next((ln for ln in lines if ln.startswith("model name")), "")
        flags = next((ln for ln in lines if ln.startswith("flags")), "")
        basis = model + "|" + flags
    except OSError:
        import platform

        basis = platform.processor() + "|" + platform.machine()
    # cpuinfo alone is NOT sufficient under VM virtualization: two VMs
    # exposed identical cpuinfo here while LLVM (which queries cpuid
    # directly) tuned for different microarchs -- one emitted
    # +prefer-no-scatter/+prefer-no-gather (the Downfall/GDS mitigation
    # dimension) and its AOT entries computed ~11% wrong on the other
    # machine.  The kernel's vulnerability reports track exactly those
    # microarch dimensions, so fold them into the key.
    for p in sorted(glob.glob("/sys/devices/system/cpu/vulnerabilities/*")):
        try:
            with open(p) as f:
                basis += f"|{os.path.basename(p)}={f.read().strip()}"
        except OSError:
            pass
    # Even cpuinfo + vulnerabilities collided once more (round 3): a VM
    # whose vulnerability files all read "Not affected" loaded entries
    # compiled with +prefer-no-gather from an earlier VM.  The VM masks
    # /proc identity (generic "Intel Xeon @ 2.10GHz", microcode 0x1)
    # while LLVM reads real cpuid, so NO /proc- or /sys-derived key can
    # be sufficient.  Scope the key to the boot instead: one cold
    # compile per VM/boot, zero chance of foreign AOT code.
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            basis += "|boot=" + f.read().strip()
    except OSError:
        pass
    return hashlib.sha1(basis.encode()).hexdigest()[:12]


def enable_compile_cache(cache_dir=None, min_compile_secs=2.0):
    """Enable jax's persistent compilation cache.

    The solver's sweep bodies are large programs (cold compile of the full
    weld pipeline is minutes over a remote-device tunnel); a disk cache
    makes every run after the first start in seconds.  Must be called
    before the first jit execution.  jax 0.9 ignores the
    JAX_COMPILATION_CACHE_DIR env var, hence the config route.

    ``cache_dir`` defaults to ``~/.cache/alifmm_tpu/jax`` (or
    $JAX_COMPILATION_CACHE_DIR if set).  The cache lives in a
    ``host-<cpu-fingerprint>`` subdirectory so XLA:CPU AOT entries are
    never shared across hosts with different CPU features (see
    ``host_cache_key``); TPU entries are unaffected beyond a re-compile
    per distinct client host.
    """
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "alifmm_tpu", "jax"
        )
    )
    cache_dir = os.path.join(cache_dir, f"host-{host_cache_key()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    return cache_dir


def save_fields(path, fields, source_indices=None):
    """Save a (n_src, Z, X) field stack; with ``source_indices`` also save
    which sources they belong to (resume support)."""
    np.savez_compressed(
        path,
        fields=np.asarray(fields),
        source_indices=(
            np.asarray(source_indices)
            if source_indices is not None
            else np.arange(np.asarray(fields).shape[0])
        ),
    )


def load_fields(path):
    d = np.load(path)
    return d["fields"], d["source_indices"]


def save_rays(out_dir, times, ray_paths_x, ray_paths_y, ray_len):
    """The weld example's output contract (Weld_rays.py:69-72)."""
    os.makedirs(out_dir, exist_ok=True)
    max_len = int(np.max(ray_len)) if np.max(ray_len) > 0 else 1
    np.save(os.path.join(out_dir, "trav_times.npy"), np.asarray(times))
    np.save(
        os.path.join(out_dir, "ray_paths_x.npy"),
        np.asarray(ray_paths_x)[:, :, :max_len],
    )
    np.save(
        os.path.join(out_dir, "ray_paths_y.npy"),
        np.asarray(ray_paths_y)[:, :, :max_len],
    )
    np.save(os.path.join(out_dir, "ray_len.npy"), np.asarray(ray_len))


def load_rays(in_dir):
    return (
        np.load(os.path.join(in_dir, "trav_times.npy")),
        np.load(os.path.join(in_dir, "ray_paths_x.npy")),
        np.load(os.path.join(in_dir, "ray_paths_y.npy")),
        np.load(os.path.join(in_dir, "ray_len.npy")),
    )
