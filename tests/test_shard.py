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
    # The slab decomposition's agreement with global sweeps is
    # numerics-sensitive: on some hosts it reaches the identical fixpoint
    # (bench_data/diag_halo.py measured 0.0 max at outer=16), on others
    # fp tie-break flips settle it on a slightly different discrete
    # solution whose relative gaps (up to ~11%) sit entirely in the
    # near-source ring where t -> 0 -- in absolute terms 2.1e-7 on a
    # 3.6e-6 s scale, as close to the analytic solution as the
    # single-device field itself (FINDINGS_r2.md "halo").  Pin the
    # envelope that holds on every host observed so regressions are
    # caught without host-dependent flakes.
    assert np.median(rel) < 2e-2, np.median(rel)
    far = single[interior] > 0.2 * single[interior].max()
    assert rel[far].max() < 1.5e-1, rel[far].max()


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
    interior = np.s_[2:-2, 2:-2]
    rel = np.abs(sharded[interior] - single[interior]) / np.maximum(
        single[interior], 1e-30
    )
    assert rel.max() < 1e-3, rel.max()


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
                             final_rel_tol=1e-10)
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
    rel = np.abs(sharded - single) / np.maximum(single, 1e-30)
    assert rel.max() < 1e-3, rel.max()


def test_ttf_halo_pads_nonmultiple_z():
    """Z not divisible by the mesh size: rows are padded/cropped and the
    true bottom-boundary stencil semantics are preserved."""
    model = _model(Z=30, X=40)
    dnx = 1e-3
    scx = dnx * np.array([20.0])
    scz = dnx * np.array([15.0])
    mesh = Mesh(np.array(jax.devices()[:4]), ("gz",))
    cfg = solver.SolveConfig(final_max_passes=48, final_polish_passes=8,
                             final_rel_tol=1e-10)
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
    rel = np.abs(sharded - single) / np.maximum(single, 1e-30)
    assert rel.max() < 1e-3, rel.max()


def test_halo_sharded_qsv_anisotropic_matches_single_device():
    """BASELINE config "qSV on ICI-sharded grid with halo exchange": a
    rotating-orientation anisotropic model using qSV shear-mode velocity
    tables, solved on a 4-slab z-sharded mesh, must agree with
    single-device global sweeps (same host-dependent envelope as the
    isotropic halo test; exact on some hosts, localized pockets on
    others)."""
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
    # qSV group curves carry cusp-flattened bins, so tie-break deviation
    # amplitude runs higher than the isotropic case (0.30 whole-interior
    # max observed on the divergent host, ~0.0 on the exact host);
    # pin the gross envelope host-independently.  (The residual-driven
    # path below holds a ~1e-3 envelope -- the legacy fixed budget here is
    # simply unconverged for qSV.)
    assert np.median(rel) < 3e-2, np.median(rel)
    assert rel.max() < 4e-1, rel.max()


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
    interior = np.s_[2:-2, 2:-2]
    rel = np.abs(sharded[interior] - single[interior]) / np.maximum(
        single[interior], 1e-30
    )
    assert rel.max() < 1e-3, rel.max()
