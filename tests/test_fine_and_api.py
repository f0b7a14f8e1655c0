"""Fine-grid solve parity (travel_finer_grid) and ALI_FMM facade tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from alifmm_tpu import ALI_FMM
from alifmm_tpu import grid as gridlib
from alifmm_tpu import materials as mats
from alifmm_tpu import solver

from ref_shim import load_reference

ref = load_reference()


def _aniso_tables():
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.zeros((361, 2))
    p = np.zeros((361, 2))
    g[:, 0] = np.arange(361)
    p[:, 0] = np.arange(361)
    g[:, 1] = mats.generate_group_vel_curve(c22, c23, c33, c44, rho)
    p[:, 1] = mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)
    return g, p


def test_fine_grid_solve_golden():
    """solve_ttf(subgrid_size=3) vs reference travel_finer_grid on a small
    anisotropic-table model."""
    Z, X = 19, 17
    dnx = 1e-3
    rng = np.random.default_rng(3)
    g, p = _aniso_tables()
    veln = np.round(rng.uniform(0, 180, (Z, X)))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = np.ones((Z, X))
    sz, sx = 9, 8

    want = ref.travel_finer_grid(
        sx * dnx, sz * dnx, veln, velpn.astype(int), vel_map, None, 3,
        g, p, 0, 0, dnx, dnx,
    )
    model = gridlib.make_model(
        veln, velpn, vel_map, None, g, p, dnx, dtype=jnp.float64
    )
    got = np.asarray(
        solver.solve_ttf(model, np.array([sx * dnx]), np.array([sz * dnx]),
                         subgrid_size=3)
    )[0]
    assert got.shape == want.shape
    mask = want > 0
    rel = np.abs(got - want)[mask] / want[mask]
    # random per-cell orientations are the adversarial case for sweep vs
    # heap ordering; bulk of the field agrees to ~1.5e-3, tail to ~3e-2
    assert rel.max() < 4e-2, rel.max()
    assert rel.mean() < 4e-3, rel.mean()


def test_fine_grid_accuracy_preset_golden_iso():
    """subgrid=9 (the ray production path) with the ACCURACY preset vs
    the reference travel_finer_grid: isotropic parity tightens from the
    default-config 4e-2 envelope to L-inf < 4.5e-3 (measured 2.9e-3,
    mean 3.5e-4 -- bench_data/diag_analytic_r4.py round-4 sweep)."""
    Z, X = 19, 17
    dnx = 1e-3
    veln = np.zeros((Z, X))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = 3000.0 * np.ones((Z, X))
    tab = np.ones((361, 2))
    tab[:, 0] = np.arange(361)
    sz, sx = 9, 8
    want = ref.travel_finer_grid(
        sx * dnx, sz * dnx, veln, velpn.astype(int), vel_map, None, 9,
        tab, tab, 0, 0, dnx, dnx,
    )
    model = gridlib.make_model(
        veln, velpn, vel_map, None, tab, tab, dnx, dtype=jnp.float64
    )
    got = np.asarray(
        solver.solve_ttf(model, np.array([sx * dnx]), np.array([sz * dnx]),
                         subgrid_size=9, cfg=solver.SolveConfig.accuracy())
    )[0]
    mask = want > 0
    rel = np.abs(got - want)[mask] / want[mask]
    assert rel.max() < 4.5e-3, rel.max()
    assert rel.mean() < 6e-4, rel.mean()


def test_fine_grid_accuracy_preset_golden_random_aniso():
    """Adversarial per-cell random orientations at subgrid=9 with the
    accuracy preset: the mean tightens to < 3.5e-3 (measured 2.4e-3)
    with an honest L-inf envelope < 5e-2 (measured 3.9e-2).

    Round-5 mechanism demonstration (bench_data/diag_finegrid_remarch_r5
    .py): re-marching the reference's own field to convergence with its
    own operators shows the L-inf tail is NOT far-field heap ordering (the
    round-4 attribution) -- the heap self-corrects only <= 1.6e-2 and our
    far-field deviation is <= 1.7e-2 against one-pass and converged fields
    alike.  The 3.9e-2 tail lives ENTIRELY inside the telescoped
    near-source patch window (<= 49 fine cells Chebyshev), where the
    reference's staged heap patches and our staged sweep patches inject
    different sub-cell-resolution values that the 1x operator cannot
    arbitrate.  The bounds below encode that structure."""
    Z, X = 19, 17
    dnx = 1e-3
    rng = np.random.default_rng(3)
    g, p = _aniso_tables()
    veln = np.round(rng.uniform(0, 180, (Z, X)))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = np.ones((Z, X))
    sz, sx = 9, 8
    want = ref.travel_finer_grid(
        sx * dnx, sz * dnx, veln, velpn.astype(int), vel_map, None, 9,
        g, p, 0, 0, dnx, dnx,
    )
    model = gridlib.make_model(
        veln, velpn, vel_map, None, g, p, dnx, dtype=jnp.float64
    )
    got = np.asarray(
        solver.solve_ttf(model, np.array([sx * dnx]), np.array([sz * dnx]),
                         subgrid_size=9, cfg=solver.SolveConfig.accuracy())
    )[0]
    mask = want > 0
    rel = np.abs(got - want)[mask] / want[mask]
    assert rel.max() < 5e-2, rel.max()
    assert rel.mean() < 3.5e-3, rel.mean()
    assert np.quantile(rel, 0.99) < 3e-2, np.quantile(rel, 0.99)
    # localisation: outside the telescoped patch window the parity is
    # 2x tighter (measured 1.7e-2; the >2.5e-2 tail is patch-vs-patch)
    nnz, nnx = want.shape
    zz, xx = np.meshgrid(np.arange(nnz), np.arange(nnx), indexing="ij")
    cheb = np.maximum(np.abs(zz - sz * 9), np.abs(xx - sx * 9))
    far = mask & (cheb > 49)
    relf = np.where(mask, np.abs(got - want) / np.where(mask, want, 1), 0)
    assert relf[far].max() < 2.5e-2, relf[far].max()


@pytest.fixture
def small_setup():
    Z, X = 31, 29
    dnx = 1e-3
    veln = np.zeros((Z, X))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = 3000.0 * np.ones((Z, X))
    scx = dnx * np.array([3.0, 25.0, 14.0])
    scz = dnx * np.array([2.0, 2.0, 28.0])
    return veln, velpn, vel_map, scx, scz, dnx


def test_constructor_validation(small_setup):
    veln, velpn, vel_map, scx, scz, dnx = small_setup
    # stif_den must be int64 (Anis_TTF_rays.py:3820-3822)
    bad = np.ones(veln.shape + (5,), dtype=np.int32)
    with pytest.raises(TypeError):
        ALI_FMM(veln, velpn, vel_map, scx, scz, stif_den=bad, dnx=dnx)
    # velpn must be integer (:3834-3838)
    with pytest.raises(TypeError):
        ALI_FMM(veln, velpn.astype(float), vel_map, scx, scz, dnx=dnx)
    fm = ALI_FMM(veln, velpn, vel_map, scx, scz, dnx=dnx)
    assert fm.nsrc == 3
    assert fm.velocity_dat.shape == (361, 2)
    # solve_opts forwards to solver.SolveConfig (production tuning knob)
    fm2 = ALI_FMM(veln, velpn, vel_map, scx, scz, dnx=dnx,
                  solve_opts=dict(final_rel_tol=2e-3, sweep_block=4))
    assert fm2._cfg.final_rel_tol == 2e-3
    assert fm2._cfg.sweep_block == 4
    with pytest.raises(TypeError):
        ALI_FMM(veln, velpn, vel_map, scx, scz, dnx=dnx,
                solve_opts=dict(not_a_knob=1))


def test_update_and_update_i(small_setup):
    veln, velpn, vel_map, scx, scz, dnx = small_setup
    fm = ALI_FMM(veln, velpn, vel_map, scx, scz, dnx=dnx, dtype=jnp.float64)
    fields = fm.update(veln, velpn, vel_map)
    assert fields.shape == (3, 31, 29)
    # masked sources return zeros (Anis_TTF_rays.py:3917)
    masked = fm.update(veln, velpn, vel_map, sources=np.array([1, 0, 1]))
    assert np.all(masked[1] == 0)
    np.testing.assert_allclose(masked[0], fields[0], rtol=1e-12)
    one = fm.update_i(2, veln, velpn, vel_map)
    np.testing.assert_allclose(one, fields[2], rtol=1e-12)
    # source at its own cell has ~zero time
    for k, (cx, cz) in enumerate(zip(scx, scz)):
        iz, ix = round(cz / dnx), round(cx / dnx)
        assert fields[k, iz, ix] == 0.0


def test_update_parallel_matches_update(small_setup, tmp_path, monkeypatch):
    veln, velpn, vel_map, scx, scz, dnx = small_setup
    fm = ALI_FMM(veln, velpn, vel_map, scx, scz, dnx=dnx, dtype=jnp.float64)
    a = fm.update(veln, velpn, vel_map)
    b = fm.update_parallel(veln, velpn, vel_map, n_threads=4)
    np.testing.assert_allclose(a, b, rtol=1e-12)
    # low_mem spills to temp_TTF_{i}.npy and returns None (:3611-3615)
    monkeypatch.chdir(tmp_path)
    out = fm.update_parallel(veln, velpn, vel_map, low_mem=True)
    assert out is None
    spilled = np.load(tmp_path / "temp_TTF_1.npy")
    np.testing.assert_allclose(spilled, a[1], rtol=1e-12)


def test_find_all_ttf_rays(small_setup):
    veln, velpn, vel_map, scx, scz, dnx = small_setup
    fm = ALI_FMM(veln, velpn, vel_map, scx, scz, dnx=dnx, dtype=jnp.float64)
    times = fm.find_all_TTF_rays(veln, velpn, vel_map, subgrid_size=9)
    # default pairs: upper triangle (:4291-4297)
    assert times.shape == (3, 3)
    assert np.all(times[np.tril_indices(3)] == 0)
    v0 = 3000.0
    for i in range(3):
        for j in range(i + 1, 3):
            d = dnx * np.hypot(
                round(scx[i] / dnx) - round(scx[j] / dnx),
                round(scz[i] / dnx) - round(scz[j] / dnx),
            )
            # interp-mode rays on a coarse field: a few percent of path
            # bowing on short rays is expected; grid-mode parity is tested
            # exactly in test_rays_golden.py
            assert abs(times[i, j] - d / v0) / (d / v0) < 4e-2
    rx, ry = fm.ray_path(0, 1)
    assert rx is not None and len(rx) == fm.ray_len[0, 1]
    # coordinates are on the original grid (divided by subgrid, :4355)
    assert abs(rx[0] - round(scx[0] / dnx)) < 1e-9
    assert abs(ry[-1] - round(scz[1] / dnx)) < 1e-9
    # uncomputed pair
    assert fm.ray_path(1, 0) == (None, None)


def test_ray_tracer_dispatch(small_setup):
    """ray_opts tracer=descent/auto select the fast marchers.  Truth on a
    constant-velocity model is the straight-line time; every tracer's
    integral is an upper bound on it (Fermat), so each must land within
    its path-quality tolerance *above* truth.  (The plane search is not a
    valid oracle here: on a grid this coarse its 1-cell path jitter costs
    ~2-3%, more than the descent marcher's chord error.)"""
    veln, velpn, vel_map, scx, scz, dnx = small_setup
    v0 = 3000.0
    iu = np.triu_indices(3, k=1)

    def truth():
        d = np.zeros((3, 3))
        for i in range(3):
            for j in range(3):
                d[i, j] = dnx * np.hypot(
                    round(scx[i] / dnx) - round(scx[j] / dnx),
                    round(scz[i] / dnx) - round(scz[j] / dnx),
                )
        return d / v0

    t0 = truth()
    for tracer, tol in (("search", 4e-2), ("descent", 4e-2), ("auto", 4e-2)):
        fm = ALI_FMM(veln, velpn, vel_map, scx, scz, dnx=dnx,
                     dtype=jnp.float64,
                     ray_opts={} if tracer == "search"
                     else dict(tracer=tracer))
        times = fm.find_all_TTF_rays(veln, velpn, vel_map, subgrid_size=9)
        rel = (times[iu] - t0[iu]) / t0[iu]
        assert rel.max() < tol, (tracer, rel)
        # upper bound: integrated times can exceed truth but a tracer
        # materially *below* the straight-line time means a broken
        # integrator (small negative slack allows f64 interp rounding)
        assert rel.min() > -1e-3, (tracer, rel)


def test_find_all_ttf_rays_parallel_guard(small_setup):
    veln, velpn, vel_map, scx, scz, dnx = small_setup
    fm = ALI_FMM(veln, velpn, vel_map, scx, scz, dnx=dnx, dtype=jnp.float64)
    with pytest.raises(Exception, match="n_threads"):
        fm.find_all_TTF_rays_parallel(veln, velpn, vel_map, n_threads=1)


def test_add_materials_and_curves():
    veln = np.zeros((8, 8))
    velpn = np.ones((8, 8), dtype=int)
    fm = ALI_FMM(veln, velpn, np.ones((8, 8)), np.array([0.0]),
                 np.array([0.0]))
    mat = np.array([263e9, 145e9, 216e9, 129e9, 7800.0])
    fm.add_materials(mat)
    assert fm.velocity_dat.shape == (361, 2)
    curve = fm.generate_group_vel(*mat, plot=False)
    np.testing.assert_allclose(fm.velocity_dat[:, 1], curve, rtol=1e-12)
    fm.add_materials(mat, keep_materials=True)
    assert fm.velocity_dat.shape == (361, 3)
    np.testing.assert_allclose(fm.velocity_dat[:, 2], curve, rtol=1e-12)
