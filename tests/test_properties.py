"""Physics property tests (SURVEY.md section 4 test-pyramid items that are
not golden comparisons): ray-time reciprocity, travel-time monotonicity
along rays, and two-sided physical bounds of the solved fields.

Model: smooth rotating-orientation anisotropic table material -- curved
characteristics everywhere, no reference oracle involved.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from alifmm_tpu import grid as gridlib
from alifmm_tpu import materials as mats
from alifmm_tpu import rays as rayslib
from alifmm_tpu import solver

Z, X = 45, 41
DNX = 5e-4
A = (4, 6)     # (z, x) grid indices
B = (40, 36)
S = 9


@pytest.fixture(scope="module")
def problem():
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.zeros((361, 2))
    p = np.zeros((361, 2))
    g[:, 0] = np.arange(361)
    p[:, 0] = np.arange(361)
    g[:, 1] = mats.generate_group_vel_curve(c22, c23, c33, c44, rho)
    p[:, 1] = mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    veln = np.round(
        (30.0 + 60.0 * np.sin(zz / 11.0) * np.cos(xx / 9.0)) % 180
    )
    velpn = np.ones((Z, X), dtype=int)
    vel_map = np.ones((Z, X))
    model = gridlib.make_model(
        veln, velpn, vel_map, None, g, p, DNX, dtype=jnp.float64
    )
    scx = np.array([A[1] * DNX, B[1] * DNX])
    scz = np.array([A[0] * DNX, B[0] * DNX])
    ttfs = np.asarray(solver.solve_ttf(model, scx, scz))
    return model, g, ttfs


def _bilinear(f, y, x):
    x0 = np.clip(np.floor(x).astype(int), 0, X - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, Z - 2)
    fx = x - x0
    fy = y - y0
    return (
        f[y0, x0] * (1 - fy) * (1 - fx)
        + f[y0, x0 + 1] * (1 - fy) * fx
        + f[y0 + 1, x0] * fy * (1 - fx)
        + f[y0 + 1, x0 + 1] * fy * fx
    )


def test_field_physical_bounds(problem):
    """dist / v_max <= tt <= dist / v_min everywhere: the first arrival can
    neither beat the fastest material along a straight line nor lose to the
    slowest (Fermat: the straight path is an admissible candidate)."""
    model, g, ttfs = problem
    vmin, vmax = g[1:, 1].min(), g[1:, 1].max()
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    for k, (sz, sx) in enumerate((A, B)):
        dist = DNX * np.hypot(zz - sz, xx - sx)
        m = dist > 0
        t = ttfs[k]
        assert np.all(t[m] >= dist[m] / vmax * (1 - 1e-9))
        assert np.all(t[m] <= dist[m] / vmin * (1 + 1e-6))


def test_field_reciprocity(problem):
    """tt_B(A) == tt_A(B) up to the two solves' independent discretization
    error (measured ~9e-3 on this model)."""
    model, g, ttfs = problem
    tab = ttfs[1][A]
    tba = ttfs[0][B]
    assert abs(tab - tba) / tab < 3e-2


def test_ray_time_reciprocity_and_monotonicity(problem):
    """The exactly-integrated A->B and B->A ray times must agree (Fermat
    paths are direction-symmetric; measured ~8e-4 here), and the receiver
    field sampled along each ray must decrease monotonically toward the
    receiver (rays descend the travel-time field)."""
    model, g, ttfs = problem
    src_xy = jnp.asarray([[A[1] * S, A[0] * S], [B[1] * S, B[0] * S]], float)
    rec_xy = jnp.asarray([[B[1] * S, B[0] * S], [A[1] * S, A[0] * S]], float)
    tidx = jnp.asarray([1, 0])
    rx, ry, lens, times = rayslib.trace_rays(
        model, jnp.asarray(ttfs), tidx, src_xy, rec_xy, S, mode="interp"
    )
    times = np.asarray(times, np.float64)
    lens = np.asarray(lens)
    rel = abs(times[0] - times[1]) / times.mean()
    assert rel < 5e-3, rel

    for r in range(2):
        n = int(lens[r])
        assert n > 10
        vx = np.asarray(rx)[r][:n] / S
        vy = np.asarray(ry)[r][:n] / S
        v = _bilinear(ttfs[int(np.asarray(tidx)[r])], vy, vx)
        dv = np.diff(v)
        assert dv.max() <= 1e-10, dv.max()
        assert v[-1] <= 1e-12  # receiver end: zero travel time
