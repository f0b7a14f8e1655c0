"""2D (z, x) halo decomposition on the virtual 8-device CPU mesh.

The 1D slab layout (tests/test_shard.py) scales memory but its z-sweeps
serialize across slabs; the 2D ("gz", "gx") mesh pipelines each
directional sweep along its own axis and parallelises it across the
other (shard._halo_block2d), recovering throughput.  Correctness bar is
the same as 1D: the pipelined order reproduces the single-device op
order, so sharded == single-device to fp identity.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from alifmm_tpu import grid as gridlib
from alifmm_tpu import solver
from alifmm_tpu.ops import sweep
from alifmm_tpu.ops.stencils import INF
from alifmm_tpu.parallel import shard


def _model(Z, X, dnx=1e-3, v0=3000.0, veln=None):
    return gridlib.make_model(
        np.zeros((Z, X)) if veln is None else veln,
        np.ones((Z, X), dtype=int),
        v0 * np.ones((Z, X)),
        None, None, None, dnx, dtype=jnp.float64,
    )


SMALL_STAGES = ((1, 9), (2, 3))
SMALL_SEED = 4


def _mesh24():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("gz", "gx"))


def test_halo2d_matches_single_device():
    """Fixed-budget 2D-decomposed solve vs the identical sweep sequence
    on one device: pipelined order => fp identity (rtol 1e-9)."""
    Z, X = 32, 40
    model = _model(Z, X)
    tt0 = jnp.full((Z, X), INF, jnp.float64).at[16, 20].set(0.0)
    fixed = jnp.zeros((Z, X), bool).at[16, 20].set(True)

    sharded = np.asarray(
        shard.solve_halo_sharded(
            tt0, model, fixed, _mesh24(), axis=("gz", "gx"),
            n_outer=40, n_inner=1, polish=8,
        )
    )
    single, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=0.0, max_passes=40, polish_passes=8
    )
    np.testing.assert_allclose(sharded, np.asarray(single), rtol=1e-9,
                               atol=0)


def test_ttf_halo2d_telescoped_pads_both_axes():
    """Production path on the 2D mesh with Z and X both non-multiples of
    their axis extents: padded, cropped, and matching the single-chip
    staged pipeline to residual-stop level.  The off-grid-edge source
    exercises the padded-corner semantics."""
    Z, X = 30, 39
    model = _model(Z, X)
    dnx = 1e-3
    scx = dnx * np.array([20.0, 36.0])
    scz = dnx * np.array([15.0, 28.0])
    cfg = solver.SolveConfig(final_max_passes=48, final_polish_passes=8,
                             final_rel_tol=1e-10, final_max_polish=48)
    sharded, info = shard.solve_ttf_halo(
        model, scx, scz, _mesh24(), axis=("gz", "gx"), cfg=cfg,
        stages=SMALL_STAGES, seed_side=SMALL_SEED, return_info=True,
    )
    sharded = np.asarray(sharded)
    assert sharded.shape == (2, Z, X)
    assert bool(info.converged)
    single = np.asarray(
        solver._staged_solve(
            model, jnp.asarray(scx), jnp.asarray(scz), SMALL_STAGES,
            SMALL_SEED, -1.0, cfg,
        )
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=0)


def test_halo2d_anisotropic_matches_single_device():
    """Smoothly varying orientation field (anisotropic tables) on the 2D
    mesh: stencil *selection* is orientation-dependent, so this guards
    the carry/halo refresh order on a medium where stale values would
    flip selections (the round-2 failure mode)."""
    from alifmm_tpu import materials as mats

    Z, X = 32, 40
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.stack([np.arange(361.0),
                  mats.generate_group_vel_curve(c22, c23, c33, c44, rho)], 1)
    p = np.stack([np.arange(361.0),
                  mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)], 1)
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    veln = np.round((60 + 40 * np.sin(zz / 6.0) * np.cos(xx / 5.0)) % 180)
    model = gridlib.make_model(
        veln, np.ones((Z, X), dtype=int), np.ones((Z, X)), None, g, p,
        1e-3, dtype=jnp.float64,
    )
    tt0 = jnp.full((Z, X), INF, jnp.float64).at[9, 31].set(0.0)
    fixed = jnp.zeros((Z, X), bool).at[9, 31].set(True)

    sharded = np.asarray(
        shard.solve_halo_sharded(
            tt0, model, fixed, _mesh24(), axis=("gz", "gx"),
            n_outer=48, n_inner=1, polish=10,
        )
    )
    single, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=0.0, max_passes=48, polish_passes=10
    )
    np.testing.assert_allclose(sharded, np.asarray(single), rtol=1e-9,
                               atol=0)
