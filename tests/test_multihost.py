"""Multi-host init story (parallel/multihost.py).

True DCN scale-out cannot run on one box; what IS testable here (and was
never automated in the reference, which had no multi-node story at all):
the single-host degradation path, the hybrid mesh construction on the
8-device virtual platform, and a sharded solve through a hybrid mesh.
"""

import numpy as np

import jax

from alifmm_tpu import grid as gridlib
from alifmm_tpu import solver
from alifmm_tpu.parallel import multihost, shard


def test_init_is_single_host_noop(monkeypatch):
    # no coordinator env, no pod/SLURM markers -> clean no-op
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
              "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert multihost.init() is False
    assert multihost.is_initialized() is False
    assert "process 0/1" in multihost.process_summary()


def test_hybrid_mesh_single_host_defaults():
    mesh = multihost.hybrid_mesh()
    n = jax.local_device_count()
    assert mesh.axis_names == ("src", "gz")
    assert mesh.devices.shape == (n, 1)


def test_hybrid_mesh_grid_axis_split():
    mesh = multihost.hybrid_mesh(grid_per_host=2)
    n = jax.local_device_count()
    assert mesh.devices.shape == (n // 2, 2)


def test_sharded_solve_through_hybrid_mesh():
    """solve_ttf_sharded must run with the hybrid (src, gz) mesh -- the
    layout a multi-host job uses -- and match the unsharded solve."""
    mesh = multihost.hybrid_mesh(grid_per_host=2)
    Z, X = 25, 27
    dnx = 1e-3
    model = gridlib.make_model(
        np.zeros((Z, X)), np.ones((Z, X), dtype=int),
        3000.0 * np.ones((Z, X)), dnx=dnx,
    )
    cfg = solver.SolveConfig(patch_max_passes=4, final_max_passes=6,
                             polish_passes=2)
    scx = dnx * np.array([5.0, 13.0, 21.0, 8.0])
    scz = dnx * np.array([3.0, 12.0, 20.0, 17.0])
    stages = ((1, 9), (2, 3))
    got = np.asarray(
        shard.solve_ttf_sharded(model, scx, scz, mesh, cfg=cfg,
                                stages=stages, seed_side=4)
    )
    import jax.numpy as jnp

    want = np.asarray(
        solver._staged_solve(model, jnp.asarray(scx), jnp.asarray(scz),
                             stages, 4, -1.0, cfg)
    )
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)
