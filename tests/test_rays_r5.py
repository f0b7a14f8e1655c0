"""Round-5 ray-tracer features: sorted closed-form segment integration,
widened plane windows (plane_dist), adaptive homogeneous-region strides
(fast_step_scale), and the coarser gentle-approach stride (near_step).
"""

import numpy as np

import jax.numpy as jnp

from alifmm_tpu import grid as gridlib
from alifmm_tpu import materials as mats
from alifmm_tpu import rays as rayslib
from alifmm_tpu import solver


def _iso_model(Z=28, X=32, dnx=1e-3, v0=3000.0):
    return gridlib.make_model(
        np.zeros((Z, X)), np.ones((Z, X), dtype=int), v0 * np.ones((Z, X)),
        None, None, None, dnx, dtype=jnp.float64,
    )


def _aniso_model(Z=28, X=32, dnx=1e-3, seed=3):
    rng = np.random.default_rng(seed)
    c = (263e9, 145e9, 216e9, 129e9, 7800.0)
    g = np.stack([np.arange(361.0),
                  mats.generate_group_vel_curve(*c)], axis=1)
    p = np.stack([np.arange(361.0),
                  mats.generate_phase_vel_curve(*c)], axis=1)
    veln = np.round(rng.uniform(0, 180, (Z, X)))
    return gridlib.make_model(
        veln, np.ones((Z, X), dtype=int), np.ones((Z, X)), None, g, p, dnx,
        dtype=jnp.float64,
    )


def _trace_setup(model, dnx, s=3):
    """Receiver travel-time fields (rays march DOWN the receiver's field
    toward its origin, like the reference's fused per-receiver worker)."""
    Z, X = model.shape
    cfg = solver.SolveConfig()
    rec = [(X - 8.0, Z - 2.0), (6.0, Z - 3.0)]
    scx = dnx * np.array([rec[0][0], rec[1][0]])
    scz = dnx * np.array([rec[0][1], rec[1][1]])
    ttfs = solver.solve_ttf(model, scx, scz, 1, cfg)
    src_xy = jnp.asarray([[4.0 * s, 0.0], [(X - 5.0) * s, 0.0]])
    rec_xy = jnp.asarray([[rec[0][0] * s, rec[0][1] * s],
                          [rec[1][0] * s, rec[1][1] * s]])
    tidx = jnp.asarray([0, 1])
    return ttfs, tidx, src_xy, rec_xy


def test_segment_time_full_length_beyond_slot_budget():
    """The sorted integrator must integrate the FULL segment length even
    when the segment has more crossings than slots (the old walk silently
    truncated the distance -- the appended-receiver-tail underestimation
    bug).  On a uniform medium the answer is exact regardless of slots."""
    model = _iso_model()
    mat_flat = rayslib._material_flat(model)
    s = 3
    # a ~24-coarse-cell diagonal: far more crossings than 4 slots
    t_small = float(rayslib.segment_time(
        model, mat_flat, jnp.asarray([3.0]), jnp.asarray([3.0]),
        jnp.asarray([75.0]), jnp.asarray([66.0]), s, max_cross=4)[0])
    t_big = float(rayslib.segment_time(
        model, mat_flat, jnp.asarray([3.0]), jnp.asarray([3.0]),
        jnp.asarray([75.0]), jnp.asarray([66.0]), s, max_cross=40)[0])
    want = model.dnx * np.hypot(72.0, 63.0) / 3.0 / 3000.0
    np.testing.assert_allclose(t_small, want, rtol=1e-12)
    np.testing.assert_allclose(t_big, want, rtol=1e-12)


def test_segment_time_matches_walk_on_anisotropic():
    """Sorted closed form == sequential walk on rough anisotropic media
    (same midpoint-cell rule), within fp reassociation."""
    model = _aniso_model()
    mat_flat = rayslib._material_flat(model)
    rng = np.random.default_rng(1)
    s = 3
    n = 32
    x1 = jnp.asarray(rng.uniform(0, 90, n))
    y1 = jnp.asarray(rng.uniform(0, 78, n))
    x2 = jnp.asarray(rng.uniform(0, 90, n))
    y2 = jnp.asarray(rng.uniform(0, 78, n))
    a = np.asarray(rayslib.segment_time(model, mat_flat, x1, y1, x2, y2, s,
                                        max_cross=40))
    b = np.asarray(rayslib._segment_time_walk(model, mat_flat, x1, y1, x2,
                                              y2, s, max_cross=80))
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_plane_dist_widens_window_same_answer_when_smooth():
    """On smooth media the wider candidate window must not change the
    physics: ray times agree with the default window to ~1e-3."""
    dnx = 1e-3
    model = _iso_model()
    ttfs, tidx, src_xy, rec_xy = _trace_setup(model, dnx)
    kw = dict(mode="interp", max_steps=80, quad_vel=3, relax_iters=1,
              relax_quad=3)
    t3 = np.asarray(rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy,
                                       3, step_scale=3, **kw)[3])
    t5 = np.asarray(rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy,
                                       3, step_scale=3, plane_dist=5,
                                       **kw)[3])
    np.testing.assert_allclose(t5, t3, rtol=2e-3)


def test_fast_step_scale_uniform_medium():
    """On a fully uniform medium the homogeneity mask is all-true, so the
    adaptive stride takes long steps everywhere: rays still arrive and the
    times stay within 2e-3 of the careful-stride result."""
    dnx = 1e-3
    model = _iso_model()
    assert bool(np.asarray(rayslib._uniform_mask(model, 6)).all())
    ttfs, tidx, src_xy, rec_xy = _trace_setup(model, dnx)
    kw = dict(mode="interp", max_steps=80, quad_vel=3, relax_iters=1,
              relax_quad=3)
    bx, by, lens, t_slow, reas = rayslib.trace_rays(
        model, ttfs, tidx, src_xy, rec_xy, 3, step_scale=2,
        return_reason=True, **kw)
    bx, by, lens_f, t_fast, reas_f = rayslib.trace_rays(
        model, ttfs, tidx, src_xy, rec_xy, 3, step_scale=2,
        fast_step_scale=6, return_reason=True, **kw)
    assert np.all(np.asarray(reas_f) == 0)
    assert np.asarray(lens_f).max() < np.asarray(lens).max()
    np.testing.assert_allclose(np.asarray(t_fast), np.asarray(t_slow),
                               rtol=2e-3)


def test_uniform_mask_blocks_fast_steps_near_structure():
    """The homogeneity mask must be False within the dilation radius of
    any material variation."""
    Z, X = 28, 32
    vel = 3000.0 * np.ones((Z, X))
    vel[14, 16] = 1500.0  # one slow cell
    model = gridlib.make_model(
        np.zeros((Z, X)), np.ones((Z, X), dtype=int), vel, None, None,
        None, 1e-3, dtype=jnp.float64,
    )
    m = np.asarray(rayslib._uniform_mask(model, 5))
    assert not m[14, 16]
    assert not m[10, 16] and not m[14, 12]  # within radius 5
    assert m[2, 2] and m[25, 29]            # far corners unaffected


def test_near_step_still_arrives():
    dnx = 1e-3
    model = _iso_model()
    ttfs, tidx, src_xy, rec_xy = _trace_setup(model, dnx)
    kw = dict(mode="interp", max_steps=80, quad_vel=3, relax_iters=1,
              relax_quad=3)
    bx, by, lens, t2, reas = rayslib.trace_rays(
        model, ttfs, tidx, src_xy, rec_xy, 3, step_scale=3, near_step=2,
        return_reason=True, **kw)
    assert np.all(np.asarray(reas) == 0)
    t1 = np.asarray(rayslib.trace_rays(model, ttfs, tidx, src_xy, rec_xy,
                                       3, step_scale=3, **kw)[3])
    np.testing.assert_allclose(np.asarray(t2), t1, rtol=3e-3)
