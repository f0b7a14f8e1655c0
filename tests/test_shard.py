"""Multi-device tests on the virtual 8-device CPU mesh: sharded results
must match single-device results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from alifmm_tpu import grid as gridlib
from alifmm_tpu import solver
from alifmm_tpu.ops import sweep
from alifmm_tpu.ops.stencils import INF
from alifmm_tpu.parallel import shard


def _model(Z=32, X=40, dnx=1e-3, v0=3000.0):
    return gridlib.make_model(
        np.zeros((Z, X)),
        np.ones((Z, X), dtype=int),
        v0 * np.ones((Z, X)),
        None, None, None, dnx, dtype=jnp.float64,
    )


SMALL_STAGES = ((1, 9), (2, 3))
SMALL_SEED = 4


def test_source_sharded_matches_unsharded():
    model = _model()
    dnx = 1e-3
    scx = dnx * np.linspace(4, 35, 8)
    scz = dnx * np.linspace(2, 29, 8)
    mesh = Mesh(np.array(jax.devices()[:8]), ("src",))
    cfg = solver.SolveConfig()
    sharded = np.asarray(
        shard.solve_ttf_sharded(
            model, scx, scz, mesh, cfg=cfg, stages=SMALL_STAGES,
            seed_side=SMALL_SEED,
        )
    )
    unsharded = np.asarray(
        solver._staged_solve(
            model, jnp.asarray(scx), jnp.asarray(scz), SMALL_STAGES,
            SMALL_SEED, -1.0, cfg,
        )
    )
    np.testing.assert_allclose(sharded, unsharded, rtol=1e-12)


def test_source_sharded_pads_odd_batch():
    model = _model()
    dnx = 1e-3
    scx = dnx * np.array([5.0, 20.0, 33.0])  # 3 sources on 8 devices
    scz = dnx * np.array([3.0, 15.0, 28.0])
    mesh = Mesh(np.array(jax.devices()[:8]), ("src",))
    out = shard.solve_ttf_sharded(
        model, scx, scz, mesh, stages=SMALL_STAGES, seed_side=SMALL_SEED
    )
    assert out.shape[0] == 3


def test_halo_sharded_matches_single_device():
    """Grid-sharded halo-exchange solve vs the same Jacobi/sweep structure
    on one device.  Interior physics must agree away from the outer rows
    (the sharded path approximates the true grid-boundary stencils at the
    outermost slabs' edges)."""
    model = _model(Z=32, X=40)
    Z, X = 32, 40
    tt0 = jnp.full((Z, X), INF, jnp.float64).at[16, 20].set(0.0)
    fixed = jnp.zeros((Z, X), bool).at[16, 20].set(True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    sharded = np.asarray(
        shard.solve_halo_sharded(
            tt0, model, fixed, mesh, n_outer=16, n_inner=1, polish=8
        )
    )
    single, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=1e-12, max_passes=40, polish_passes=8
    )
    single = np.asarray(single)
    interior = np.s_[2:-2, 2:-2]
    rel = np.abs(sharded[interior] - single[interior]) / np.maximum(
        single[interior], 1e-30
    )
    # Slab-local sweeps + halo exchange converge to a slightly different
    # ordering-dependent fixpoint than global sweeps (median ~1%, localized
    # pockets ~11% today).  This test pins the current agreement so
    # regressions are caught; tightening the decomposition (pipelined
    # cross-slab sweeps) is the planned fix.
    assert np.median(rel) < 2e-2, np.median(rel)
    far = single[interior] > 0.2 * single[interior].max()
    assert rel[far].max() < 1.5e-1, rel[far].max()
