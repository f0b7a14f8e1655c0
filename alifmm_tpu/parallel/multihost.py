"""Multi-host (DCN) initialisation and mesh construction.

The reference has no multi-node story at all -- its outermost runtime is
a single-box ``multiprocessing`` pool (Anis_TTF_rays.py:3938-4051; SURVEY
section 2 "distributed communication backend").  The TPU-native scale-out
ladder is:

1. one chip: ``vmap`` over the source batch (solver._staged_solve);
2. one host, many chips: ``solve_ttf_sharded`` / ``solve_ttf_halo`` over
   an ICI ``Mesh`` (parallel/shard.py);
3. many hosts: ``jax.distributed`` + a hybrid DCN x ICI mesh from this
   module, with the *source batch* laid out over DCN (embarrassingly
   parallel -- one all-gather at the end at most) and the *grid* (halo
   exchanges every sweep) kept inside each host's ICI domain, so the
   chatty collectives never cross the slow network.

Usage (same program on every host, e.g. under SLURM/GKE):

    from alifmm_tpu.parallel import multihost
    multihost.init()                       # env-driven jax.distributed
    mesh = multihost.hybrid_mesh()         # ("src" over DCN, "gz" over ICI)
    ttfs = shard.solve_ttf_sharded(model, scx, scz, mesh, axis="src")

Every function degrades cleanly on a single host (init() is a no-op,
hybrid_mesh() returns a plain ICI mesh), so the same driver script runs
from a laptop CPU to a multi-host pod.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["init", "is_initialized", "hybrid_mesh", "process_summary"]

_initialized = False
_init_result: bool | None = None


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None,
         local_device_ids=None) -> bool:
    """Initialise ``jax.distributed`` for a multi-host job.

    Must run before the first jax computation on every participating
    process.  With no arguments, resolves everything from the
    environment the way ``jax.distributed.initialize`` does (TPU pod
    metadata, SLURM variables, or ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``); explicit arguments win.

    Returns True when a multi-process runtime was actually set up,
    False for the single-process no-op (no coordinator configured and no
    pod/SLURM autodetection available) -- callers can branch on it but
    normally don't need to: all downstream mesh/solve code works either
    way.  Idempotent: a second call is a no-op returning the first
    call's result.
    """
    global _initialized, _init_result
    explicit_args = any(
        a is not None
        for a in (coordinator_address, num_processes, process_id,
                  local_device_ids)
    )
    # A cached False only short-circuits auto-detect calls: an earlier
    # no-argument call in a non-distributed environment must not swallow a
    # later EXPLICIT initialisation (ADVICE round 4).  A successful init
    # (True) is always cached -- jax.distributed can only init once.
    if _init_result is not None and (_init_result or not explicit_args):
        return _init_result
    env = os.environ
    if coordinator_address is None:
        coordinator_address = env.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])

    def _tasks(*keys):
        """Task count from the first launcher variable that parses."""
        for k in keys:
            try:
                return int(env.get(k, ""))
            except ValueError:
                continue
        return 1

    explicit = coordinator_address is not None
    auto = any(
        k in env
        for k in (
            # TPU pod / GKE metadata jax autodetects from
            "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    ) or (
        # SLURM / OpenMPI launchers: only a real multi-task launch counts.
        # A single-process run inside an allocation (salloc without srun,
        # 1-task array job) must NOT trigger distributed init.
        _tasks("SLURM_NTASKS", "SLURM_NPROCS") > 1
        or _tasks("OMPI_COMM_WORLD_SIZE") > 1
    )
    if not (explicit or auto):
        _init_result = False
        return False

    import jax

    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)
    _initialized = True
    _init_result = True
    return True


def is_initialized() -> bool:
    """Whether init() set up a multi-process runtime in this process."""
    return _initialized


def hybrid_mesh(src_axis: str = "src", grid_axis: str = "gz",
                grid_per_host: int | None = None):
    """A (src, gz) device mesh laid out DCN-outer, ICI-inner.

    ``grid_per_host`` chips per host go to the grid (halo) axis -- the
    chatty dimension, kept on ICI; the rest of the parallelism (across
    hosts and any leftover in-host chips) goes to the source axis, whose
    only communication is the final result gather.  Default: all of one
    host's chips on the grid axis when running multi-host, and a plain
    single-axis source mesh on one host (the common case -- transducer
    batches outnumber chips long before grids outgrow chip memory).

    Returns a ``jax.sharding.Mesh`` with axes ``(src_axis, grid_axis)``;
    a size-1 axis is kept (harmless under PartitionSpec) so callers can
    address both names unconditionally.
    """
    import jax
    from jax.sharding import Mesh

    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if grid_per_host is None:
        grid_per_host = n_local if n_proc > 1 else 1
    if n_local % grid_per_host:
        raise ValueError(
            f"grid_per_host={grid_per_host} does not divide the "
            f"{n_local} local devices"
        )
    if n_proc > 1:
        from jax.experimental import mesh_utils

        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(n_local // grid_per_host, grid_per_host),
            dcn_mesh_shape=(n_proc, 1),
            devices=jax.devices(),
        )
    else:
        devices = np.asarray(jax.devices()).reshape(
            n_local // grid_per_host, grid_per_host
        )
    return Mesh(devices, (src_axis, grid_axis))


def process_summary() -> str:
    """One-line diagnostic of the distributed topology (for logs)."""
    import jax

    return (
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"{jax.local_device_count()} local / {jax.device_count()} global "
        f"{jax.default_backend()} devices"
    )
