"""Ray-tracer parity: trace_rays in "grid" mode vs the reference find_ray
on the same receiver travel-time field, plus segment-time parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from alifmm_tpu import grid as gridlib
from alifmm_tpu import materials as mats
from alifmm_tpu import rays as rayslib

from ref_shim import load_reference

ref = load_reference()


def _setup(Z=25, X=23, dnx=1e-3, seed=11):
    rng = np.random.default_rng(seed)
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.zeros((361, 2))
    p = np.zeros((361, 2))
    g[:, 0] = np.arange(361)
    p[:, 0] = np.arange(361)
    g[:, 1] = mats.generate_group_vel_curve(c22, c23, c33, c44, rho)
    p[:, 1] = mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)
    veln = np.round(rng.uniform(0, 180, (Z, X)))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = np.ones((Z, X))
    return veln, velpn, vel_map, g, p, dnx


def test_segment_time_matches_reference():
    veln, velpn, vel_map, g, p, dnx = _setup()
    s = 9
    model = gridlib.make_model(veln, velpn, vel_map, None, g, p, dnx,
                               dtype=jnp.float64)
    mat_flat = rayslib._material_flat(model)
    rng = np.random.default_rng(0)
    n = 40
    x1 = rng.uniform(0, 22 * s, n)
    y1 = rng.uniform(0, 24 * s, n)
    x2 = np.clip(x1 + rng.uniform(-4 * s, 4 * s, n), 0, 22 * s)
    y2 = np.clip(y1 + rng.uniform(-4 * s, 4 * s, n), 0, 24 * s)
    want = np.array(
        [
            ref.time_between_points(
                x1[i], x2[i], y1[i], y2[i], dnx, s, g, veln,
                velpn.astype(int), vel_map, None,
            )
            for i in range(n)
        ]
    )
    got = np.asarray(
        rayslib.segment_time(
            model, mat_flat, jnp.asarray(x1), jnp.asarray(y1),
            jnp.asarray(x2), jnp.asarray(y2), s, max_cross=20,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_trace_rays_matches_reference_find_ray():
    veln, velpn, vel_map, g, p, dnx = _setup()
    Z, X = veln.shape
    s = 9

    # receiver field from the reference itself (oracle), fine grid
    rec_iz, rec_ix = 2, 3
    ttf = ref.travel_finer_grid(
        rec_ix * dnx, rec_iz * dnx, veln, velpn.astype(int), vel_map, None,
        s, g, p, 0, 0, dnx, dnx,
    )

    sources = [(22, 19), (20, 4), (12, 20)]
    want = []
    for (iz, ix) in sources:
        rx, ry, t = ref.find_ray(
            dnx, g, np.array([ix * s, iz * s]), np.array([rec_ix * s, rec_iz * s]),
            ttf, veln, velpn.astype(int), vel_map, None, s,
        )
        want.append((rx, ry, t))

    model = gridlib.make_model(veln, velpn, vel_map, None, g, p, dnx,
                               dtype=jnp.float64)
    src_xy = jnp.asarray([[ix * s, iz * s] for (iz, ix) in sources],
                         jnp.float64)
    rec_xy = jnp.asarray([[rec_ix * s, rec_iz * s]] * len(sources),
                         jnp.float64)
    gx, gy, lens, times = rayslib.trace_rays(
        model, jnp.asarray(ttf)[None], jnp.zeros(len(sources), jnp.int32),
        src_xy, rec_xy, s, mode="grid",
    )
    gx, gy = np.asarray(gx), np.asarray(gy)
    lens, times = np.asarray(lens), np.asarray(times)

    for k, (rx, ry, t) in enumerate(want):
        assert lens[k] == len(rx), (k, lens[k], len(rx))
        np.testing.assert_allclose(gx[k, : lens[k]], rx, atol=1e-6)
        np.testing.assert_allclose(gy[k, : lens[k]], ry, atol=1e-6)
        assert abs(times[k] - t) / t < 1e-9, (times[k], t)
