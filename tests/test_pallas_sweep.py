"""Pallas sweep kernel vs the XLA sweep driver (interpreter mode on CPU).

The kernel reuses stencils.local_update, so agreement here validates the
VMEM in-place Gauss-Seidel mechanics, the sign-encoded fixed mask, the
folded Christoffel coefficients, and the transposed x-axis pass.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alifmm_tpu import grid as gridlib
from alifmm_tpu.ops import pallas_sweep, stencils, sweep


@pytest.fixture(scope="module")
def model():
    Z, X = 20, 26
    rng = np.random.default_rng(3)
    veln = np.round(rng.uniform(0, 180, (Z, X)))
    velpn = np.ones((Z, X), dtype=int)
    velpn[5:15, 7:19] = 0
    vel_map = np.where(velpn == 1, 5790.0, 1.0).astype(np.float32)
    stif = np.zeros((Z, X, 5), dtype=np.int64)
    stif[:, :] = [263000, 148000, 216000, 129000, 8100]
    return gridlib.make_model(
        veln, velpn, vel_map, stif, None, None, 2e-4, dtype=jnp.float32
    )


def _seeded(model, B=3):
    Z, X = model.shape
    tt0 = np.full((B, Z, X), stencils.INF, np.float32)
    fixed = np.zeros((B, Z, X), bool)
    for b in range(B):
        sz, sx = 9 + b, 13 - 2 * b
        tt0[b, sz, sx] = 0.0
        fixed[b, sz, sx] = True
        tt0[b, sz, sx + 1] = 4e-8
        fixed[b, sz, sx + 1] = True
    return jnp.asarray(tt0), jnp.asarray(fixed)


def test_phase_coeff_reproduces_phase_velocity(model):
    coeff = pallas_sweep.phase_coeff_planes(model)
    assert coeff is not None
    eff = jnp.asarray(
        np.random.default_rng(0).uniform(0, 180, model.shape), jnp.float32
    )
    want = np.asarray(gridlib.phase_velocity_at(model, eff))
    got = np.asarray(
        pallas_sweep._vel_from_coeff(eff, coeff[0], coeff[1], coeff[2],
                                     coeff[3])
    )
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_solve_fixpoint_matches_xla(model, monkeypatch):
    monkeypatch.setattr(pallas_sweep, "INTERPRET", True)
    tt0, fixed = _seeded(model)
    ref, _ = sweep.solve_fixpoint(
        tt0, model, fixed, rel_tol=1e-4, max_passes=8, polish_passes=3
    )
    got, _ = pallas_sweep.solve_fixpoint_pallas(
        tt0, model, fixed, rel_tol=1e-4, max_passes=8, polish_passes=3,
        batch_chunk=2,
    )
    ref = np.asarray(ref)
    got = np.asarray(got)
    mask = ~np.asarray(fixed)
    rel = np.abs(got - ref) / np.maximum(ref, 1e-12)
    # f32 rounding differences only (folded-coefficient velocity path)
    assert rel[mask].max() < 1e-4


def test_atan_poly_accuracy():
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-80, 80, 50000), jnp.float32
    )
    want = np.arctan(np.asarray(x, np.float64))
    got = np.asarray(stencils.atan_poly(x), np.float64)
    assert np.abs(got - want).max() < 3e-7
