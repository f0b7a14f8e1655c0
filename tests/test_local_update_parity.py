"""Point-by-point parity of the vectorised local update against the
reference update() / fouds18_A() executed as a pure-Python oracle.

Covers the ALI square + triangular stencil selection, wavefront
interpolation, boundary special cases, and the full multi-stencil FD
fallback, on random partial travel-time fields with table materials.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from alifmm_tpu import grid as gridlib
from alifmm_tpu import materials as mats
from alifmm_tpu.ops import stencils

from ref_shim import load_reference

ref = load_reference()


def _make_tables(rng, n_mats=2):
    """Anisotropic group/phase tables from random orthotropic stiffnesses."""
    g = np.zeros((361, n_mats + 1))
    p = np.zeros((361, n_mats + 1))
    g[:, 0] = np.arange(361)
    p[:, 0] = np.arange(361)
    for m in range(n_mats):
        c22 = rng.uniform(200e9, 280e9)
        c33 = rng.uniform(200e9, 280e9)
        c44 = rng.uniform(80e9, 130e9)
        c23 = rng.uniform(100e9, min(c22, c33) * 0.7)
        rho = rng.uniform(7000, 8000)
        g[:, m + 1] = mats.generate_group_vel_curve(c22, c23, c33, c44, rho)
        p[:, m + 1] = mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)
    return g, p


def _reference_grid_update(ttn, nsts, veln, velpn, vel_map, g_tab, p_tab, dnx):
    """Apply reference update()+fouds18_A() at every grid point."""
    nnz, nnx = ttn.shape
    out = np.zeros_like(ttn)
    for iz in range(nnz):
        for ix in range(nnx):
            v = ref.update(
                veln, velpn, vel_map, nsts, ttn, iz, ix, dnx, nnz, nnx, p_tab, None
            )
            if v == -1.0:
                v = ref.fouds18_A(
                    iz, ix, nsts, ttn, dnx, dnx, nnx, nnz, veln, velpn, vel_map,
                    g_tab, None,
                )
            out[iz, ix] = v
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_local_update_matches_reference(seed):
    rng = np.random.default_rng(seed)
    nnz, nnx = 11, 13
    dnx = 2e-4

    g_tab, p_tab = _make_tables(rng)
    veln = rng.uniform(0, 180, (nnz, nnx))
    velpn = rng.integers(1, 3, (nnz, nnx))
    vel_map = rng.uniform(0.8, 1.2, (nnz, nnx))

    # random partial field: ~60% known points with distance-like times
    known = rng.random((nnz, nnx)) < 0.6
    zz, xx = np.meshgrid(np.arange(nnz), np.arange(nnx), indexing="ij")
    base = dnx * np.hypot(zz - nnz / 2, xx - nnx / 3) / 5000.0
    ttn = np.where(known, base * rng.uniform(0.9, 1.1, (nnz, nnx)) + 1e-7, 0.0)
    nsts = np.where(known, 0, -1)

    want = _reference_grid_update(ttn, nsts, veln, velpn, vel_map, g_tab, p_tab, dnx)

    model = gridlib.make_model(
        veln, velpn, vel_map, None, g_tab, p_tab, dnx, dtype=jnp.float64
    )
    tt = jnp.where(jnp.asarray(known), jnp.asarray(ttn), stencils.INF)
    got = np.asarray(
        stencils.full_grid_update(tt, model, jnp.zeros((nnz, nnx), bool))
    )

    # Points where the reference produced a finite estimate must match.
    # Reference "no candidate anywhere" comes out as min(0-chain, ttn)
    # which our INF representation reports as INF; exclude those.
    ref_finite = want > 0
    got_cmp = np.where(got >= stencils.INF * 0.5, np.inf, got)
    mism = ref_finite & ~np.isclose(got_cmp, want, rtol=1e-9, atol=1e-15)
    if mism.any():
        idx = np.argwhere(mism)[:10]
        msg = "\n".join(
            f"  ({i},{j}): got {got_cmp[i, j]!r} want {want[i, j]!r}"
            for i, j in idx
        )
        raise AssertionError(f"{mism.sum()} mismatching points:\n{msg}")


def test_local_update_all_known_interior():
    """With every neighbour known the ALI square stencils should dominate and
    match the reference everywhere including edges."""
    rng = np.random.default_rng(42)
    nnz, nnx = 9, 10
    dnx = 1e-3
    g_tab, p_tab = _make_tables(rng, n_mats=1)
    veln = rng.uniform(0, 90, (nnz, nnx))
    velpn = np.ones((nnz, nnx), dtype=int)
    vel_map = np.ones((nnz, nnx))
    zz, xx = np.meshgrid(np.arange(nnz), np.arange(nnx), indexing="ij")
    ttn = dnx * np.hypot(zz - 4, xx - 5) / 3000.0 + 1e-8
    nsts = np.zeros((nnz, nnx), dtype=int)

    want = _reference_grid_update(ttn, nsts, veln, velpn, vel_map, g_tab, p_tab, dnx)
    model = gridlib.make_model(
        veln, velpn, vel_map, None, g_tab, p_tab, dnx, dtype=jnp.float64
    )
    got = np.asarray(
        stencils.full_grid_update(
            jnp.asarray(ttn), model, jnp.zeros((nnz, nnx), bool)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-15)
