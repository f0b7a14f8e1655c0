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
    """Grid-sharded halo-exchange solve vs the identical sweep sequence on
    one device: with the pipelined-GS z-sweeps the op order is the same,
    so the whole field must match to fp identity."""
    model = _model(Z=32, X=40)
    Z, X = 32, 40
    tt0 = jnp.full((Z, X), INF, jnp.float64).at[16, 20].set(0.0)
    fixed = jnp.zeros((Z, X), bool).at[16, 20].set(True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    sharded = np.asarray(
        shard.solve_halo_sharded(
            tt0, model, fixed, mesh, n_outer=40, n_inner=1, polish=8
        )
    )
    # rel_tol=0: phase 1 runs the full 40 rounds (early stop only on an
    # exactly-zero delta, where further rounds are exact no-ops) so the
    # round counts match the halo side's fixed n_outer=40 bit-for-bit
    single, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=0.0, max_passes=40, polish_passes=8
    )
    single = np.asarray(single)
    # The z-sweeps are pipelined across slabs (shard._halo_jacobi_block),
    # so every sharded pass is bit-identical to a single-device gs_pass:
    # with matching budgets (n_outer >= single's phase-1 count; extra
    # min-phase rounds at the fixpoint are no-ops; polish counts equal)
    # the fields agree to fp identity.  Round 2's 2e-2/0.15 envelopes
    # ("host-dependent near-source pockets") covered a real defect: the
    # Jacobi-stale slab boundaries flipped the replace phase's
    # min-difference stencil selections onto a different self-consistent
    # field (24% at 2 cells for a last-slab-row source,
    # bench_data/diag_halo_r3*.py).
    np.testing.assert_allclose(sharded, single, rtol=1e-9, atol=0)


def test_halo_converged_matches_single_device_tight():
    """Residual-driven halo solve (rel_tol set): running the replace-mode
    polish to ITS OWN fixpoint (not a fixed round count) must pin the
    decomposed solve onto the single-device field far tighter than the
    fixed-budget envelopes above."""
    model = _model(Z=32, X=40)
    Z, X = 32, 40
    tt0 = jnp.full((Z, X), INF, jnp.float64).at[16, 20].set(0.0)
    fixed = jnp.zeros((Z, X), bool).at[16, 20].set(True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    sharded, info = shard.solve_halo_sharded(
        tt0, model, fixed, mesh, n_inner=1, polish=4,
        rel_tol=1e-10, max_outer=64, max_polish=48, return_info=True,
    )
    sharded = np.asarray(sharded)
    assert bool(info.converged), int(info.passes)
    single, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=1e-12, max_passes=64, polish_passes=48
    )
    single = np.asarray(single)
    # pipelined-GS sweeps: both sides run the identical op order; the
    # only slack is each side's own residual-stop point (1e-10 scale)
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=0)


def test_ttf_halo_telescoped_matches_single_chip():
    """The production large-grid path: telescoped patches + residual-driven
    halo final stage (solve_ttf_halo) vs the single-chip staged pipeline
    with the same stages/config -- near-source accuracy comes from the
    shared telescoping, so the comparison covers the whole field."""
    model = _model(Z=32, X=40)
    dnx = 1e-3
    scx = dnx * np.array([20.0, 5.0])
    scz = dnx * np.array([16.0, 3.0])
    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    cfg = solver.SolveConfig(final_max_passes=48, final_polish_passes=8,
                             final_rel_tol=1e-10, final_max_polish=48)
    sharded, info = shard.solve_ttf_halo(
        model, scx, scz, mesh, cfg=cfg, stages=SMALL_STAGES,
        seed_side=SMALL_SEED, return_info=True,
    )
    sharded = np.asarray(sharded)
    assert bool(info.converged)
    single = np.asarray(
        solver._staged_solve(
            model, jnp.asarray(scx), jnp.asarray(scz), SMALL_STAGES,
            SMALL_SEED, -1.0, cfg,
        )
    )
    # identical telescoped stages + pipelined-GS final stage: agreement
    # is residual-stop-level (the halo polish runs residual-driven vs the
    # single chip's fixed count)
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=0)


def test_ttf_halo_pads_nonmultiple_z():
    """Z not divisible by the mesh size: rows are padded/cropped and the
    true bottom-boundary stencil semantics are preserved."""
    model = _model(Z=30, X=40)
    dnx = 1e-3
    scx = dnx * np.array([20.0])
    scz = dnx * np.array([15.0])
    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    cfg = solver.SolveConfig(final_max_passes=48, final_polish_passes=8,
                             final_rel_tol=1e-10, final_max_polish=48)
    sharded = np.asarray(
        shard.solve_ttf_halo(
            model, scx, scz, mesh, cfg=cfg, stages=SMALL_STAGES,
            seed_side=SMALL_SEED,
        )
    )
    assert sharded.shape == (1, 30, 40)
    single = np.asarray(
        solver._staged_solve(
            model, jnp.asarray(scx), jnp.asarray(scz), SMALL_STAGES,
            SMALL_SEED, -1.0, cfg,
        )
    )
    # the source here sits on slab 1's LAST row -- the exact geometry
    # that broke the round-2 Jacobi-boundary scheme at 24% (diag_halo_r3)
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=0)


def test_halo_sharded_qsv_anisotropic_matches_single_device():
    """BASELINE config "qSV on ICI-sharded grid with halo exchange": a
    rotating-orientation anisotropic model using qSV shear-mode velocity
    tables, solved on a 4-slab z-sharded mesh, must match single-device
    global sweeps to fp identity (pipelined-GS sweeps, matched
    budgets)."""
    from alifmm_tpu import materials as mats

    Z, X = 32, 40
    dnx = 1e-3
    g, p = mats.generate_mode_curves(
        263e9, 145e9, 216e9, 129e9, 7800.0, mode="qSV"
    )
    gtab = np.stack([np.arange(361.0), g], axis=1)
    ptab = np.stack([np.arange(361.0), p], axis=1)
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    veln = np.round(
        (30.0 + 60.0 * np.sin(zz / 7.0) * np.cos(xx / 6.0)) % 180
    )
    model = gridlib.make_model(
        veln, np.ones((Z, X), dtype=int), np.ones((Z, X)), None,
        gtab, ptab, dnx, dtype=jnp.float64,
    )
    tt0 = jnp.full((Z, X), INF, jnp.float64).at[16, 20].set(0.0)
    fixed = jnp.zeros((Z, X), bool).at[16, 20].set(True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    sharded = np.asarray(
        shard.solve_halo_sharded(
            tt0, model, fixed, mesh, n_outer=40, n_inner=1, polish=8
        )
    )
    # rel_tol=0: phase 1 runs the full 40 rounds (early stop only on an
    # exactly-zero delta, where further rounds are exact no-ops) so the
    # round counts match the halo side's fixed n_outer=40 bit-for-bit
    single, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=0.0, max_passes=40, polish_passes=8
    )
    single = np.asarray(single)
    # matched 40+8 budgets, pipelined-GS sweeps: bit-identical op order
    # even though a 40-pass qSV budget is not yet converged -- the round-2
    # 0.3/0.4 envelopes covered the Jacobi-boundary selection defect
    np.testing.assert_allclose(sharded, single, rtol=1e-9, atol=0)


def test_halo_converged_qsv_tight():
    """qSV on the sharded grid with the residual-driven stop and a
    shear-mode-sized budget (SolveConfig.for_mode): the round-2 0.4
    envelope was an unconverged-budget artefact, not an intrinsic limit
    -- converged, the decomposition matches single-device sweeps to
    ~1e-3."""
    from alifmm_tpu import materials as mats

    Z, X = 32, 40
    dnx = 1e-3
    g, p = mats.generate_mode_curves(
        263e9, 145e9, 216e9, 129e9, 7800.0, mode="qSV"
    )
    gtab = np.stack([np.arange(361.0), g], axis=1)
    ptab = np.stack([np.arange(361.0), p], axis=1)
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    veln = np.round(
        (30.0 + 60.0 * np.sin(zz / 7.0) * np.cos(xx / 6.0)) % 180
    )
    model = gridlib.make_model(
        veln, np.ones((Z, X), dtype=int), np.ones((Z, X)), None,
        gtab, ptab, dnx, dtype=jnp.float64,
    )
    tt0 = jnp.full((Z, X), INF, jnp.float64).at[16, 20].set(0.0)
    fixed = jnp.zeros((Z, X), bool).at[16, 20].set(True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    sharded, info = shard.solve_halo_sharded(
        tt0, model, fixed, mesh, n_inner=1, polish=4,
        rel_tol=1e-10, max_outer=128, max_polish=64, return_info=True,
    )
    sharded = np.asarray(sharded)
    assert bool(info.converged), int(info.passes)
    single, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=1e-12, max_passes=128, polish_passes=64
    )
    single = np.asarray(single)
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=0)


def test_trace_rays_sharded_matches_and_caches():
    """Sharded ray batches match the unsharded tracer bit-for-bit, and
    repeated calls with the same (mesh, config) reuse ONE compiled
    executable (ADVICE round 4: a fresh closure was retraced per call)."""
    from alifmm_tpu import rays as rayslib

    model = _model()
    dnx = 1e-3
    cfg = solver.SolveConfig()
    scx = dnx * np.array([6.0, 30.0])
    scz = dnx * np.array([0.0, 0.0])
    ttfs = solver.solve_ttf(model, scx, scz, 1, cfg)
    s = 3
    src_xy = jnp.asarray([[6.0 * s, 0.0], [30.0 * s, 0.0],
                          [6.0 * s, 0.0], [30.0 * s, 0.0]])
    rec_xy = jnp.asarray([[20.0 * s, 31.0 * s]] * 4)
    tidx = jnp.asarray([0, 1, 0, 1])
    mesh = Mesh(np.array(jax.devices()[:4]), ("src",))
    kw = dict(max_steps=80, step_scale=2, relax_iters=1)
    shard._TRACE_SHARDED_CACHE.clear()
    out_s = shard.trace_rays_sharded(
        model, ttfs, tidx, src_xy, rec_xy, s, mesh, **kw)
    out_u = rayslib.trace_rays(
        model, ttfs, tidx, src_xy, rec_xy, s, mode="interp", **kw)
    for a, b in zip(out_s, out_u):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert len(shard._TRACE_SHARDED_CACHE) == 1
    # second call (different coords, same config): cache must not grow
    out_s2 = shard.trace_rays_sharded(
        model, ttfs, tidx, src_xy + 1.0, rec_xy, s, mesh, **kw)
    assert len(shard._TRACE_SHARDED_CACHE) == 1
    assert np.asarray(out_s2[3]).shape == (4,)
