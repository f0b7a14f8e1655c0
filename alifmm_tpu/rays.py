"""Batched Fermat ray tracing through receiver travel-time fields.

TPU-native re-design of the reference ray tracer:

* ``segment_time``  <- time_between_points (Anis_TTF_rays.py:2835-2989):
  exact cell-boundary-crossing walk as a fixed-length masked scan.
* ``ray_times``     <- ray_time            (Anis_TTF_rays.py:2992-3022).
* ``trace_rays``    <- find_ray            (Anis_TTF_rays.py:3104-3465):
  plane-search marching, vectorised over (a) all candidate points on the
  search plane and (b) all source-receiver pairs at once.

The reference picks one of four plane orientations per step with branching;
here the four cases select a common parameterisation (base point + unit
step along the plane + valid range) so a single evaluation path serves all
rays in the batch -- no lax.switch, no per-ray divergence.

Travel-time fields can be sampled in two modes:
* ``"grid"``   -- rec_TTF lives on the subgrid-refined grid and plane points
  gather exact grid values (reference parity);
* ``"interp"`` -- rec_TTF lives on the model grid and plane points sample it
  bilinearly at virtual fine coordinates (the fast default: the solve stays
  coarse, rays still march in fine steps).

Coordinates follow the reference convention: ray (x, y) in fine-grid units,
TTF indexed [y, x], materials looked up on the *original* grid
(fine / subgrid_size, Anis_TTF_rays.py:2867-2870).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import grid as gridlib
from . import materials as mats

__all__ = ["segment_time", "segment_time_quad", "ray_times", "trace_rays",
           "trace_rays_descent", "trace_rays_auto", "relax_rays"]

_BIG = 1.0e30


def _material_flat(model: gridlib.Model, exact: bool = False):
    """Per-cell material rows for the segment integrator.

    Fast path (default, requires model.ray_curve_idx): (Z*X, 3) rows of
    (veln, vel_map, unified-curve index) -- velocity comes from the
    precomputed unified curve table (exact for table cells, 1-degree
    sampled for stiffness cells).  ``exact=True`` (or a model without
    precomputed curves) falls back to (Z*X, 8) rows with the full
    stiffness so the closed-form Christoffel solve runs per crossing,
    bit-matching the reference.
    """
    Z, X = model.shape
    if exact or model.ray_curve_idx is None:
        cols = [
            model.veln,
            model.velpn.astype(model.veln.dtype),
            model.vel_map,
            model.stif[..., 0],
            model.stif[..., 1],
            model.stif[..., 2],
            model.stif[..., 3],
            model.stif[..., 4],
        ]
        return jnp.stack(cols, axis=-1).reshape(Z * X, 8)
    cols = [
        model.veln,
        model.vel_map,
        model.ray_curve_idx.astype(model.veln.dtype),
    ]
    return jnp.stack(cols, axis=-1).reshape(Z * X, 3)


def _group_velocity_cell(model, mat_row, eff):
    """Group velocity at effective angle ``eff`` for gathered cell rows
    (reference velocity dispatch, Anis_TTF_rays.py:2950-2978)."""
    # NOTE: gather-based interpolation on purpose.  The solver's sweep
    # kernel uses the hat-expansion interp_table because gathers stall its
    # line scans, but every ray integrator already gathers its material
    # row per sample -- one more (181-entry-table) gather is ~free, while
    # the 181-knot expansion inflates the compiled ray program ~10x
    # (measured 19.5 MB -> ~2 MB executable on the weld bench).
    if mat_row.shape[-1] == 3:  # unified-curve fast path
        return mats.interp_table_gather(
            model.ray_curves, eff,
            mat_row[..., 2].astype(jnp.int32), mat_row[..., 1],
        )
    veln, velpn, vel_map = mat_row[..., 0], mat_row[..., 1], mat_row[..., 2]
    v_tab = mats.interp_table_gather(
        model.group_tab, eff, velpn.astype(jnp.int32), vel_map
    )
    if not model.has_stif:
        return v_tab
    v_chr = mats.group_velocity_christoffel(
        eff, mat_row[..., 3], mat_row[..., 4], mat_row[..., 5],
        mat_row[..., 6], mat_row[..., 7], vel_map,
    )
    return jnp.where(velpn != 0, v_tab, v_chr)


def segment_time(model: gridlib.Model, mat_flat, x1, y1, x2, y2,
                 subgrid_size, max_cross: int = 16):
    """Straight-segment travel time between fine-grid points, integrating
    cell by cell exactly like time_between_points
    (Anis_TTF_rays.py:2835-2989) -- but with the crossings enumerated in
    CLOSED FORM instead of walked sequentially.

    The reference (and the previous scan implementation) advances one
    cell-boundary crossing per step, a chain of ``max_cross`` dependent
    tiny steps that is pure launch latency on TPU.  A straight segment's
    x- and y-boundary crossings are two arithmetic sequences in the
    segment parameter t: merging them is ONE vectorised sort over
    2*max_cross+2 breakpoints, after which every interval's midpoint
    cell, length and velocity evaluate in parallel (one gather + one
    velocity evaluation for all intervals at once).

    Semantics match the walk exactly (same midpoint-picks-the-cell rule,
    same accumulation), with one improvement: ``max_cross`` here bounds
    the crossings PER AXIS, and the final breakpoint is always the
    segment end -- a segment with more crossings than slots integrates
    its full length with coarser material sampling instead of silently
    truncating the distance (the old walk under-estimated long
    appended-receiver tails).

    All coordinate arguments broadcast (the caller batches over rays and
    candidates).
    """
    Z, X = model.shape
    dt = model.vel_map.dtype
    s = subgrid_size
    x1, x2 = x1 / s, x2 / s
    y1, y2 = y1 / s, y2 / s

    dx = x2 - x1
    dy = y2 - y1
    dx_zero = dx == 0
    dy_zero = dy == 0
    angle = jnp.where(
        dx_zero,
        0.0,
        jnp.degrees(jnp.arctan(dy / jnp.where(dx_zero, 1.0, dx))),
    )
    length = jnp.sqrt(dx * dx + dy * dy)

    shp = jnp.broadcast_shapes(jnp.shape(x1), jnp.shape(x2),
                               jnp.shape(y1), jnp.shape(y2))
    x1 = jnp.broadcast_to(jnp.asarray(x1, dt), shp)
    y1 = jnp.broadcast_to(jnp.asarray(y1, dt), shp)
    k = jnp.arange(max_cross, dtype=dt).reshape((max_cross,) + (1,) * len(shp))

    def axis_ts(p1, d, zero):
        # crossing parameters t_k of p(t) = p1 + t*d with the boundaries
        # round(p1) + sign(d)*(k + 1/2); monotone in k, clipped to the
        # segment end so out-of-range crossings become zero-length tail
        # intervals
        sgn = jnp.where(d < 0, -1.0, 1.0)
        d_safe = jnp.where(zero, 1.0, d)
        t = (jnp.round(p1) + sgn * (k + 0.5) - p1) / d_safe
        return jnp.where(zero, 1.0, jnp.clip(t, 0.0, 1.0))

    tx = axis_ts(x1, dx, dx_zero)
    ty = axis_ts(y1, dy, dy_zero)
    one = jnp.ones((1,) + shp, dt)
    t = jnp.sort(jnp.concatenate([tx, ty, one], axis=0), axis=0)
    t0 = jnp.concatenate([jnp.zeros((1,) + shp, dt), t[:-1]], axis=0)
    # interval midpoints pick the material cell (reference midpoint rule,
    # Anis_TTF_rays.py:2939-2940); zero-length intervals contribute 0
    tm = 0.5 * (t0 + t)
    x_pos = jnp.clip(jnp.round(x1 + tm * dx).astype(jnp.int32), 0, X - 1)
    y_pos = jnp.clip(jnp.round(y1 + tm * dy).astype(jnp.int32), 0, Z - 1)
    dists = model.dnx * length * (t - t0)
    row = jnp.take(mat_flat, y_pos * X + x_pos, axis=0)
    eff = jnp.mod(row[..., 0] - angle[None], 180.0)
    vel = _group_velocity_cell(model, row, eff)
    return jnp.sum(dists / vel, axis=0)


def _segment_time_walk(model: gridlib.Model, mat_flat, x1, y1, x2, y2,
                       subgrid_size, max_cross: int = 16):
    """Sequential crossing-walk segment integrator: the original
    step-by-step traversal of time_between_points (one crossing per scan
    step, ``max_cross`` crossings TOTAL, truncating beyond).

    Numerically this and segment_time agree to ~1e-15 relative, but the
    ray march's candidate argmin sits in a Fermat valley flat to < 1e-9 s,
    where even reassociation-level differences shift the chosen vertex by
    a fraction of a cell.  Reference *path* parity (find_ray vertex
    positions, tests/test_rays_golden.py) therefore needs the scoring
    arithmetic to follow the reference walk exactly -- so the
    ``quad_vel=False`` parity mode of trace_rays scores with this walk,
    while production modes and final integration use the faster sorted
    closed form (segment_time)."""
    Z, X = model.shape
    dt = model.vel_map.dtype
    s = subgrid_size
    x1, x2 = x1 / s, x2 / s
    y1, y2 = y1 / s, y2 / s

    dx_zero = x2 == x1
    angle = jnp.where(
        dx_zero,
        0.0,
        jnp.degrees(jnp.arctan((y2 - y1) / jnp.where(dx_zero, 1.0, x2 - x1))),
    )
    m = jnp.where(dx_zero, 0.0, (y2 - y1) / jnp.where(dx_zero, 1.0, x2 - x1))
    c = y1 - m * x1
    dir_x = jnp.where(x1 < x2, 1.0, -1.0)
    dir_y = jnp.where(y1 < y2, 1.0, -1.0)

    def body(state, _):
        prev_x, prev_y, next_x, next_y, fin_x, fin_y = state
        done = fin_x & fin_y

        past_x = ((next_x > x2) & (dir_x == 1)) | ((next_x < x2) & (dir_x == -1))
        new_fin_x = fin_x | (past_x & ~fin_x)
        next_x = jnp.where(past_x & ~fin_x, x2, next_x)
        past_y = ((next_y > y2) & (dir_y == 1)) | ((next_y < y2) & (dir_y == -1))
        new_fin_y = fin_y | (past_y & ~fin_y)
        next_y = jnp.where(past_y & ~fin_y, y2, next_y)

        # choose whether the next crossing is an x- or a y-boundary
        m_safe = jnp.where(m == 0, 1.0, m)
        next_x_yval = m * next_x + c
        next_y_xval = (next_y - c) / m_safe
        d_xcross = (x1 - next_x) ** 2 + (y1 - next_x_yval) ** 2
        d_ycross = (x1 - next_y_xval) ** 2 + (y1 - next_y) ** 2
        take_x = jnp.where(
            dx_zero, False, jnp.where(m == 0, True, d_xcross < d_ycross)
        )
        nxv = jnp.where(dx_zero, x1, jnp.where(take_x, next_x, next_y_xval))
        nyv = jnp.where(dx_zero, next_y, jnp.where(take_x, next_x_yval, next_y))
        next_x = jnp.where(take_x & ~dx_zero, next_x + dir_x, next_x)
        next_y = jnp.where((~take_x) | dx_zero, next_y + dir_y, next_y)

        x_pos = jnp.clip(jnp.round((prev_x + nxv) / 2).astype(jnp.int32), 0, X - 1)
        y_pos = jnp.clip(jnp.round((prev_y + nyv) / 2).astype(jnp.int32), 0, Z - 1)
        dist = model.dnx * jnp.sqrt((prev_x - nxv) ** 2 + (prev_y - nyv) ** 2)
        dist = jnp.where(done, 0.0, dist)

        prev_x = jnp.where(done, prev_x, nxv)
        prev_y = jnp.where(done, prev_y, nyv)
        return (
            prev_x, prev_y, next_x, next_y,
            jnp.where(done, fin_x, new_fin_x),
            jnp.where(done, fin_y, new_fin_y),
        ), (dist, y_pos * X + x_pos)

    next_x0 = jnp.round(x1) + dir_x * 0.5
    next_y0 = jnp.round(y1) + dir_y * 0.5
    zeros = jnp.zeros(jnp.broadcast_shapes(
        jnp.shape(x1), jnp.shape(x2), jnp.shape(y1), jnp.shape(y2)), dt)
    state = (
        x1 + zeros, y1 + zeros, next_x0 + zeros, next_y0 + zeros,
        jnp.zeros_like(zeros, bool), jnp.zeros_like(zeros, bool),
    )
    _, (dists, cells) = jax.lax.scan(body, state, None, length=max_cross)
    row = jnp.take(mat_flat, cells, axis=0)
    eff = jnp.mod(row[..., 0] - angle[None], 180.0)
    vel = _group_velocity_cell(model, row, eff)
    return jnp.sum(dists / vel, axis=0)


def _simpson_time(model, mat_flat, x1, y1, x2, y2, subgrid_size, fracs,
                  weights):
    """Shared Simpson segment-time core: slowness sampled at the given
    fractions along the segment, combined with the given weights.

    All samples go through ONE stacked material gather + ONE velocity
    evaluation (instead of one per sample point): gathers are the
    latency-dominant op of the ray march/relax inner loops, so batching
    the sample axis cuts the per-step launch count ~5x while computing
    the same per-sample values.
    """
    Z, X = model.shape
    s = subgrid_size
    dx_zero = x2 == x1
    angle = jnp.where(
        dx_zero,
        0.0,
        jnp.degrees(jnp.arctan((y2 - y1) / jnp.where(dx_zero, 1.0, x2 - x1))),
    )
    dist = jnp.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2) / s

    shp = jnp.broadcast_shapes(jnp.shape(x1), jnp.shape(x2),
                               jnp.shape(y1), jnp.shape(y2))
    fr = jnp.asarray(fracs, dist.dtype).reshape((-1,) + (1,) * len(shp))
    xm = x1 + (x2 - x1) * fr  # (n_samples,) + shp
    ym = y1 + (y2 - y1) * fr
    xi = jnp.clip(jnp.round(xm / s).astype(jnp.int32), 0, X - 1)
    yi = jnp.clip(jnp.round(ym / s).astype(jnp.int32), 0, Z - 1)
    row = jnp.take(mat_flat, yi * X + xi, axis=0)
    eff = jnp.mod(row[..., 0] - angle[None], 180.0)
    slw = 1.0 / _group_velocity_cell(model, row, eff)
    w = jnp.asarray(weights, dist.dtype).reshape(fr.shape)
    acc = jnp.sum(w * slw, axis=0)
    return model.dnx * dist * acc


def segment_time_quad(model, mat_flat, x1, y1, x2, y2, subgrid_size):
    """Composite-Simpson (5-point) estimate of a straight segment's travel
    time: slowness sampled at t = 0, 1/4, 1/2, 3/4, 1 with weights
    (1, 4, 2, 4, 1)/12 instead of walking every cell-boundary crossing --
    the cheap candidate-scoring path of the ray march (see trace_rays
    ``quad_vel``).  Resolves the material cell every ~1.2 coarse cells for
    the longest step_scale=3 candidate segments, which keeps the candidate
    argmin aligned with the exact integral across material boundaries.
    Coordinates are fine-grid like segment_time.
    """
    return _simpson_time(
        model, mat_flat, x1, y1, x2, y2, subgrid_size,
        fracs=(0.0, 0.25, 0.5, 0.75, 1.0),
        weights=(1 / 12.0, 4 / 12.0, 2 / 12.0, 4 / 12.0, 1 / 12.0),
    )


def segment_time_quad3(model, mat_flat, x1, y1, x2, y2, subgrid_size):
    """3-point Simpson variant of segment_time_quad (endpoints + midpoint,
    weights (1, 4, 1)/6): 2/5 the material samples.  Used for candidate
    *ranking* in the ray march where only the relative order of nearby
    candidates matters; exact integration always follows."""
    return _simpson_time(
        model, mat_flat, x1, y1, x2, y2, subgrid_size,
        fracs=(0.0, 0.5, 1.0),
        weights=(1 / 6.0, 4 / 6.0, 1 / 6.0),
    )


def ray_times(model, mat_flat, ray_x, ray_y, lengths, subgrid_size,
              max_cross: int = 16, chunk: int = 64):
    """Travel time along padded ray polylines (ray_time,
    Anis_TTF_rays.py:2992-3022).  ``ray_x/ray_y``: (R, P) fine coords;
    segment i counts when i + 1 < lengths.

    Segments are integrated in chunks along the padded-length axis so the
    batched crossing/velocity tensors stay a few MB instead of
    R * P * max_cross * 8 floats at once.
    """
    R, P = ray_x.shape
    n_seg = P - 1
    n_chunks = -(-n_seg // chunk)
    pad = n_chunks * chunk - n_seg

    def prep(a):
        a = jnp.pad(a, ((0, 0), (0, pad)))
        return jnp.moveaxis(a.reshape(R, n_chunks, chunk), 1, 0)

    x1 = prep(ray_x[:, :-1])
    y1 = prep(ray_y[:, :-1])
    x2 = prep(jnp.pad(ray_x[:, 1:], ((0, 0), (0, 0))))
    y2 = prep(ray_y[:, 1:])
    idx = jnp.arange(n_seg + pad).reshape(n_chunks, 1, chunk)[:, 0, :]

    def one_chunk(args):
        cx1, cy1, cx2, cy2, cidx = args
        seg_t = segment_time(
            model, mat_flat, cx1, cy1, cx2, cy2, subgrid_size, max_cross
        )
        mask = (cidx[None, :] + 1) < lengths[:, None]
        return jnp.sum(jnp.where(mask, seg_t, 0.0), axis=1)

    per_chunk = jax.lax.map(one_chunk, (x1, y1, x2, y2, idx))
    return jnp.sum(per_chunk, axis=0)


def relax_rays(model, mat_flat, ray_x, ray_y, lengths, subgrid_size,
               iters: int = 2, span: float | None = None,
               max_cross: int = 12, chunk: int = 64,
               quad: bool | int = False):
    """Parallel Fermat relaxation of ray polylines.

    Each interior vertex moves along the perpendicular of its local chord
    to minimise seg(prev, v) + seg(v, next) -- the discrete Fermat
    stationarity condition -- evaluated with the exact cell-crossing
    integrator.  Vertices update in even/odd waves (neighbours of a moving
    vertex stay put within a wave) so every wave is a single vectorised
    evaluation over all rays and vertices; no sequential marching.

    Used to recover the path accuracy lost to long marching strides
    (trace_rays ``step_scale``): the march fixes the topology, relaxation
    restores the h^2 chord error.  ``span``: candidate offset h in fine
    cells (default: subgrid_size).
    """
    R, P = ray_x.shape
    if P < 3:
        return ray_x, ray_y
    h = float(subgrid_size) if span is None else float(span)
    n_mid = P - 2
    n_chunks = -(-n_mid // chunk)
    pad = n_chunks * chunk - n_mid

    def segs3(px, py, cands_x, cands_y, nx, ny):
        """seg(prev, cand) + seg(cand, next) for the 3 stacked candidates
        at once, chunked over vertices.  One instantiation of the segment
        integrator serves all candidates of all waves (the wave loop is a
        lax.scan), keeping the compiled program ~10x smaller than
        unrolling per-candidate/per-wave evaluations."""
        def prep2(a):  # (R, n_mid) -> (n_chunks, R, chunk)
            a = jnp.pad(a, ((0, 0), (0, pad)))
            return jnp.moveaxis(a.reshape(R, n_chunks, chunk), 1, 0)

        def prep3(a):  # (3, R, n_mid) -> (n_chunks, 3, R, chunk)
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
            return jnp.moveaxis(a.reshape(3, R, n_chunks, chunk), 2, 0)

        args = (
            prep2(px)[:, None], prep2(py)[:, None],
            prep3(cands_x), prep3(cands_y),
            prep2(nx)[:, None], prep2(ny)[:, None],
        )

        def one(c):
            p_x, p_y, c_x, c_y, q_x, q_y = c
            if quad:
                # Simpson scoring (segment_time_quad): ~4x fewer gathers;
                # candidate *ranking* is what relaxation needs, and the
                # final times are integrated exactly afterwards.
                # quad == 3 selects the 3-point rule (endpoints+midpoint,
                # same convention as trace_rays quad_vel=3): 2.5x fewer
                # material gathers again -- relaxation is gather-throughput
                # bound, so this is the dominant cost knob.
                quad_fn = segment_time_quad3 if quad == 3 else segment_time_quad
                return (
                    quad_fn(model, mat_flat, p_x, p_y, c_x, c_y,
                            subgrid_size)
                    + quad_fn(model, mat_flat, c_x, c_y, q_x, q_y,
                              subgrid_size)
                )
            return (
                segment_time(model, mat_flat, p_x, p_y, c_x, c_y,
                             subgrid_size, max_cross)
                + segment_time(model, mat_flat, c_x, c_y, q_x, q_y,
                               subgrid_size, max_cross)
            )
        out = jax.lax.map(one, args)  # (n_chunks, 3, R, chunk)
        out = jnp.moveaxis(out, 0, 2)  # (3, R, n_chunks, chunk)
        return out.reshape(3, R, n_chunks * chunk)[:, :, :n_mid]

    vidx = jnp.arange(1, P - 1)

    def wave(carry, parity):
        xs, ys = carry
        px, py = xs[:, :-2], ys[:, :-2]
        cx, cy = xs[:, 1:-1], ys[:, 1:-1]
        nx, ny = xs[:, 2:], ys[:, 2:]
        tx = nx - px
        ty = ny - py
        nrm = jnp.sqrt(tx * tx + ty * ty)
        nrm = jnp.where(nrm == 0.0, 1.0, nrm)
        ux = -ty / nrm
        uy = tx / nrm
        cands_x = jnp.stack([cx, cx - ux * h, cx + ux * h])
        cands_y = jnp.stack([cy, cy - uy * h, cy + uy * h])
        c0, cm, cp = segs3(px, py, cands_x, cands_y, nx, ny)
        d1 = cm - c0
        d3 = cp - c0
        ssum = d1 + d3
        convex = ssum > 0.0
        ssafe = jnp.where(convex, ssum, 1.0)
        off = jnp.clip((d1 - d3) / (2.0 * ssafe), -1.0, 1.0) * h
        # non-convex: step to whichever endpoint is cheaper (if cheaper)
        ends = jnp.where(cm < cp, -h, h)
        better = jnp.minimum(cm, cp) < c0
        off = jnp.where(convex, off, jnp.where(better, ends, 0.0))
        move = (
            ((vidx[None, :] % 2) == parity)
            & (vidx[None, :] < (lengths - 1)[:, None])
        )
        off = jnp.where(move, off, 0.0)
        xs = xs.at[:, 1:-1].set(cx + ux * off)
        ys = ys.at[:, 1:-1].set(cy + uy * off)
        return (xs, ys), None

    parities = jnp.asarray([1, 0] * iters)
    (ray_x, ray_y), _ = jax.lax.scan(wave, (ray_x, ray_y), parities)
    return ray_x, ray_y


def _sample_ttf_grad(ttf, x, y, subgrid_size, mode):
    """(T, dT/dx, dT/dy) at fine coordinates via the in-cell bilinear
    surface (gradient of the same interpolant _sample_ttf evaluates; the
    four corner gathers are shared).  Derivatives are per *fine* cell."""
    Z, X = ttf.shape
    s = 1.0 if mode == "grid" else float(subgrid_size)
    cx = jnp.clip(x / s, 0.0, X - 1.0)
    cy = jnp.clip(y / s, 0.0, Z - 1.0)
    x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, X - 2)
    y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, Z - 2)
    fx = cx - x0
    fy = cy - y0
    flat = ttf.reshape(-1)
    v00 = jnp.take(flat, y0 * X + x0)
    v01 = jnp.take(flat, y0 * X + x0 + 1)
    v10 = jnp.take(flat, (y0 + 1) * X + x0)
    v11 = jnp.take(flat, (y0 + 1) * X + x0 + 1)
    t = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    gx = ((1 - fy) * (v01 - v00) + fy * (v11 - v10)) / s
    gy = ((1 - fx) * (v10 - v00) + fx * (v11 - v01)) / s
    return t, gx, gy


def _sample_ttf(ttf, x, y, subgrid_size, mode):
    """Sample the receiver TTF at fine coordinates (x, y)."""
    if mode == "grid":
        Z, X = ttf.shape
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, X - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, Z - 1)
        return jnp.take(ttf.reshape(-1), yi * X + xi)
    # bilinear on the model grid at coarse coords
    Z, X = ttf.shape
    cx = jnp.clip(x / subgrid_size, 0.0, X - 1.0)
    cy = jnp.clip(y / subgrid_size, 0.0, Z - 1.0)
    x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, X - 2)
    y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, Z - 2)
    fx = cx - x0
    fy = cy - y0
    flat = ttf.reshape(-1)
    v00 = jnp.take(flat, y0 * X + x0)
    v01 = jnp.take(flat, y0 * X + x0 + 1)
    v10 = jnp.take(flat, (y0 + 1) * X + x0)
    v11 = jnp.take(flat, (y0 + 1) * X + x0 + 1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _uniform_mask(model: gridlib.Model, radius: int):
    """Per-cell mask: True where every material field is constant within a
    Chebyshev ``radius`` (coarse cells) -- i.e. the medium is locally
    homogeneous, so a straight segment through the neighbourhood is exactly
    Fermat-optimal and coarse quadrature scoring is exact.  Computed with
    separable 1D min/max pools (two passes per field)."""
    import jax.lax as lax

    def pool1(a, op, init, axis):
        return lax.reduce_window(
            a, init, op,
            (2 * radius + 1, 1) if axis == 0 else (1, 2 * radius + 1),
            (1, 1), "SAME",
        )

    def uniform(f):
        f = f.astype(jnp.float32)
        mx = pool1(pool1(f, lax.max, -jnp.inf, 0), lax.max, -jnp.inf, 1)
        mn = pool1(pool1(f, lax.min, jnp.inf, 0), lax.min, jnp.inf, 1)
        return mx == mn

    ok = uniform(model.veln) & uniform(model.velpn) & uniform(model.vel_map)
    if model.has_stif:
        for c in range(5):
            ok &= uniform(model.stif[..., c])
    return ok


@partial(
    jax.jit,
    static_argnames=(
        "subgrid_size", "mode", "max_steps", "max_cross", "exact_materials",
        "step_scale", "quad_vel", "return_reason", "relax_iters",
        "cand_stride", "relax_quad", "fast_step_scale", "plane_dist",
        "near_step",
    ),
)
def trace_rays(
    model: gridlib.Model,
    rec_ttf,
    ttf_index,
    source_xy,
    receiver_xy,
    subgrid_size: int,
    mode: str = "grid",
    max_steps: int | None = None,
    max_cross: int = 16,
    exact_materials: bool = False,
    step_scale: int = 1,
    quad_vel: bool = False,
    return_reason: bool = False,
    relax_iters: int = 0,
    cand_stride: float = 1.0,
    relax_quad: bool | int = True,
    fast_step_scale: int = 0,
    plane_dist: int = 3,
    near_step: int = 1,
):
    """March rays from ``source_xy`` to ``receiver_xy`` through the
    receiver's travel-time field (find_ray, Anis_TTF_rays.py:3104-3465).

    ``source_xy``/``receiver_xy``: (R, 2) fine-grid (x, y) coordinates.
    ``rec_ttf``: a (T, ...) stack of receiver fields -- on the subgrid-
    refined grid ("grid" mode) or the model grid ("interp" mode);
    ``ttf_index``: (R,) int index of each ray's receiver field in the stack
    (so each field is stored once however many rays share it, like the
    reference's fused per-receiver worker, Anis_TTF_rays.py:3719-3733).
    Returns (ray_x, ray_y, lengths, times): padded (R, P) polylines in fine
    coordinates including source and receiver, like the reference buffers
    (5 * (nnz + nnx), Anis_TTF_rays.py:3140).

    Speed knobs (defaults replicate the reference exactly):

    * ``step_scale=k`` marches k coarse cells per step instead of one
      (plane offset k*s away from the last point, dropping back to s near
      the receiver).  Rays are Fermat-stationary paths, so the travel time
      is second-order insensitive to the coarser polyline; final times are
      always integrated exactly over the returned vertices.
    * ``quad_vel=True`` scores candidate points during the march with a
      3-point Simpson quadrature of slowness along the segment (endpoint /
      midpoint material samples) instead of the exact cell-crossing walk --
      16x fewer material gathers per step.  The argmin over candidates is
      unchanged wherever the quadrature ranks candidates like the exact
      integral (it does except for hair-thin ties near material
      boundaries); final times are exact either way.
    * ``fast_step_scale=m`` (m > step_scale) marches m coarse cells per
      step wherever the medium is locally HOMOGENEOUS within the step's
      reach (_uniform_mask: all material fields constant within
      m + 4 cells), dropping back to ``step_scale`` near material
      structure and to the reference stride near the receiver.  In a
      homogeneous neighbourhood the Fermat path is exactly straight and
      quadrature candidate scoring is exact, so long strides lose no
      accuracy there -- where long strides DO break (thin slow features:
      overshoot trips the increasing-TT truncation guard,
      bench_data/FINDINGS_r2.md) the mask forces the careful stride.  On
      the weld workload (mostly uniform parent metal) this cuts the
      while-loop iteration count ~2x, and the shorter step buffer
      (``max_steps`` can shrink to match) cuts the relaxation and exact
      integration cost proportionally.
    """
    Z, X = model.shape
    s = int(subgrid_size)
    dt = model.vel_map.dtype
    R = source_xy.shape[0]
    ttf_index = jnp.asarray(ttf_index, jnp.int32)
    if mode == "grid":
        rows, cols = rec_ttf.shape[-2], rec_ttf.shape[-1]
    else:
        rows, cols = (Z - 1) * s + 1, (X - 1) * s + 1
    k_step = int(step_scale)
    if max_steps is None:
        max_steps = -(-5 * (Z + X) // k_step)
    P = max_steps + 2

    # ``plane_dist=3`` is the reference search geometry (:3133-3136); a
    # larger value widens the candidate window, raising the maximum bend
    # angle per step -- needed when step_scale outgrows the default window
    # (bend cap atan(sd / (step_scale * s)) traps refracting rays at
    # orientation-domain boundaries and trips the truncation guard).
    plane_dist = int(plane_dist)
    sd = plane_dist * s + 1                      # search_dist (:3134)
    sd2 = (plane_dist - 1) * s + 1               # search_dist_2 (:3136)
    # Candidate spacing along the plane: the reference evaluates every fine
    # cell (stride 1); stride > 1 subsamples the same +-sd window (the TT
    # along the plane is smooth, so the quadratic refinement recovers
    # sub-stride positions) -- a proportional cut in per-step cost.
    stride = float(cand_stride)
    K = int(np.ceil(2 * sd / stride)) + 1        # candidates per plane

    mat_flat = _material_flat(model, exact_materials)
    sqrt2 = np.sqrt(2.0)
    k_fast = int(fast_step_scale)
    k_eff = max(k_step, k_fast)
    if k_fast > 0:
        fast_flat = _uniform_mask(model, k_fast + 4).reshape(-1)
    # In-loop scoring must resolve every crossing of the longest candidate
    # segment: near the Fermat minimum the TT-over-candidates curve is flat
    # to ~1e-9 s, so a truncated walk (or a coarse quadrature) mis-ranks
    # candidates and trips the "increasing" truncation guard.  The longest
    # segment spans ~(step + 2) cells per axis.
    if k_eff == 1:
        in_cross = max_cross
    else:
        in_cross = max(max_cross, 2 * (k_eff + 2) + 4)

    src_x = source_xy[:, 0].astype(dt)
    src_y = source_xy[:, 1].astype(dt)
    rec_x = receiver_xy[:, 0].astype(dt)
    rec_y = receiver_xy[:, 1].astype(dt)

    # Batched TTF sampling as ONE flat gather over all rays x candidates.
    # The naive vmap(lambda i, x, y: sample(rec_ttf[i], x, y)) form lowers
    # to a per-ray dynamic-slice + gather chain that dominated the whole
    # march (~85% measured on the weld); precomputing the per-ray field
    # offset and gathering from the flattened (n_ttf*Z*X,) array turns
    # each bilinear corner into a single large gather.
    TZ, TX = rec_ttf.shape[-2], rec_ttf.shape[-1]
    flat_all = rec_ttf.reshape(-1)
    t_off = (
        ttf_index.astype(jnp.int32) * (TZ * TX)
        if rec_ttf.ndim == 3
        else jnp.zeros(ttf_index.shape, jnp.int32)
    )

    def sample_b(_t_idx, x, y):
        off = t_off.reshape(t_off.shape + (1,) * (x.ndim - 1))
        if mode == "grid":
            xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, TX - 1)
            yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, TZ - 1)
            return jnp.take(flat_all, off + yi * TX + xi)
        cx = jnp.clip(x / s, 0.0, TX - 1.0)
        cy = jnp.clip(y / s, 0.0, TZ - 1.0)
        x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, TX - 2)
        y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, TZ - 2)
        fx = (cx - x0).astype(dt)
        fy = (cy - y0).astype(dt)
        base = off + y0 * TX + x0
        # one stacked gather for the 4 bilinear corners (launch latency
        # dominates the march iteration; 4 separate takes = 4 kernels)
        v = jnp.take(
            flat_all, jnp.stack([base, base + 1, base + TX, base + TX + 1])
        )
        return (
            v[0] * (1 - fy) * (1 - fx)
            + v[1] * (1 - fy) * fx
            + v[2] * fy * (1 - fx)
            + v[3] * fy * fx
        )

    def step(state):
        (last_x, last_y, vec_x, vec_y, bx, by, length, done, reason,
         tt_last_pt, k) = state

        near2 = (last_x - rec_x) ** 2 + (last_y - rec_y) ** 2
        # snap toward the receiver inside 4*s (:3158-3160)
        snap = near2 < (4.0 * s) ** 2
        vec_x = jnp.where(snap, rec_x - last_x, vec_x)
        vec_y = jnp.where(snap, rec_y - last_y, vec_y)
        # step_scale > 1: long strides far from the receiver, reference
        # stride s inside (k_step + 3) * s so the approach stays gentle;
        # fast_step_scale: even longer strides where the medium is locally
        # homogeneous (and the receiver is beyond the fast stride's reach)
        if k_fast > 0:
            xi_f = jnp.clip(jnp.round(last_x / s).astype(jnp.int32), 0, X - 1)
            yi_f = jnp.clip(jnp.round(last_y / s).astype(jnp.int32), 0, Z - 1)
            fast_here = jnp.take(fast_flat, yi_f * X + xi_f)
            far = near2 >= ((k_fast + 3.0) * s) ** 2
            off_far = jnp.where(fast_here & far, float(k_fast * s),
                                float(k_step * s))
        else:
            off_far = float(k_step * s)
        # ``near_step > 1`` coarsens the gentle approach stride (the snap
        # inside 4*s and the exact receiver append are unchanged; Fermat
        # relaxation polishes the chord error like everywhere else)
        off = jnp.where(
            near2 < ((k_step + 3.0) * s) ** 2, float(near_step * s), off_far
        )

        scores = jnp.stack(
            [
                jnp.abs(vec_x),
                jnp.abs(vec_x + vec_y) / sqrt2,
                jnp.abs(vec_y),
                jnp.abs(vec_x - vec_y) / sqrt2,
            ]
        )
        dir_index = jnp.argmax(scores, axis=0)

        rl_x = jnp.round(last_x)
        rl_y = jnp.round(last_y)

        # --- plane parameterisation per case ------------------------------
        # case 0: x = c      -> points (c, y0 + i),     i in [0, n)
        # case 1: y = -x + c -> points (x0 + i, c - x), moving up-right/down-left
        # case 2: y = c      -> points (x0 + i, c)
        # case 3: y = x + c  -> points (x0 + i, x + c)
        c0 = rl_x + jnp.where(vec_x > 0, off, -off)
        oob0 = (c0 < 0) | (c0 >= cols)
        lo0 = jnp.maximum(0.0, rl_y - sd)
        hi0 = jnp.minimum(rows - 1.0, rl_y + sd)

        c1 = rl_x + rl_y + jnp.where(vec_x > 0, off, -off)
        lo1 = jnp.where(
            vec_x > 0,
            jnp.maximum(jnp.maximum(0.0, c1 - (rows - 1.0)), rl_x - sd2),
            jnp.maximum(jnp.maximum(0.0, c1 - (rows - 1.0)), c1 - rl_y - sd2),
        )
        hi1 = jnp.where(
            vec_x > 0,
            jnp.minimum(jnp.minimum(cols - 1.0, c1), c1 - rl_y + sd2),
            jnp.minimum(jnp.minimum(cols - 1.0, c1), rl_x + sd2),
        )

        c2 = rl_y + jnp.where(vec_y > 0, off, -off)
        oob2 = (c2 < 0) | (c2 >= rows)
        lo2 = jnp.maximum(0.0, rl_x - sd)
        hi2 = jnp.minimum(cols - 1.0, rl_x + sd)

        c3 = rl_y - rl_x + jnp.where(vec_x < 0, off, -off)
        lo3 = jnp.where(
            vec_x < 0,
            jnp.maximum(jnp.maximum(0.0, -c3), rl_y - c3 - sd2),
            jnp.maximum(jnp.maximum(0.0, -c3), rl_x - sd2),
        )
        hi3 = jnp.where(
            vec_x < 0,
            jnp.minimum(jnp.minimum(cols - 1.0, (rows - 1.0) - c3), rl_x + sd2),
            jnp.minimum(
                jnp.minimum(cols - 1.0, (rows - 1.0) - c3), rl_y - c3 + sd2
            ),
        )

        def pick(v0, v1, v2, v3):
            vals = jnp.broadcast_arrays(
                jnp.asarray(v0, dt), jnp.asarray(v1, dt),
                jnp.asarray(v2, dt), jnp.asarray(v3, dt),
            )
            d = dir_index.reshape(
                dir_index.shape + (1,) * (vals[0].ndim - dir_index.ndim)
            )
            return jnp.where(
                d == 0,
                vals[0],
                jnp.where(d == 1, vals[1], jnp.where(d == 2, vals[2], vals[3])),
            )

        lo = pick(lo0, lo1, lo2, lo3)
        hi = pick(hi0, hi1, hi2, hi3)
        # walk coordinate w: case 0 walks y, others walk x
        w = lo[:, None] + stride * jnp.arange(K, dtype=dt)[None, :]
        w = jnp.minimum(w, hi[:, None])
        n_k = jnp.clip(
            ((hi - lo) / stride).astype(jnp.int32) + 1, 1, K
        )

        px = pick(c0[:, None] + 0 * w, w, w, w)
        py = pick(w, c1[:, None] - w, c2[:, None] + 0 * w, w + c3[:, None])

        ridx = jnp.arange(R)
        tt_plane = sample_b(ttf_index, px, py)
        if quad_vel:
            quad_fn = segment_time_quad3 if quad_vel == 3 else segment_time_quad
            seg = quad_fn(
                model, mat_flat, last_x[:, None], last_y[:, None], px, py, s
            )
        else:
            # parity mode: the walk's exact fp pattern pins the candidate
            # argmin to the reference path (see _segment_time_walk)
            seg = _segment_time_walk(
                model, mat_flat,
                last_x[:, None], last_y[:, None], px, py, s, in_cross,
            )
        TT = tt_plane + seg
        col = jnp.arange(K)[None, :]
        TT = jnp.where(col < n_k[:, None], TT, _BIG)

        # endpoints (:3192-3197); position capped at K - 1 when the window
        # is wider than the evaluated K candidates (large step_scale)
        last_col = jnp.minimum(n_k - 1, K - 1)
        tt_first = TT[:, 0]
        tt_last = jnp.take_along_axis(TT, last_col[:, None], axis=1)[:, 0]
        best_val = jnp.where(tt_first < tt_last, tt_first, tt_last)
        best_pos = jnp.where(tt_first < tt_last, 0.0, last_col.astype(dt))

        # interior local minima with quadratic refinement (:3199-3218).
        # Differences-first formulation: t1 + t3 - 2 t2 cancels
        # catastrophically in f32 when the TT valley is flat (long
        # step_scale strides), exploding the vertex offset; d1/d3 are
        # computed as (exact) small differences instead, and the vertex of
        # a 3-point parabola with t2 minimal always lies in [-1/2, 1/2].
        t1 = TT[:, :-2]
        t2 = TT[:, 1:-1]
        t3 = TT[:, 2:]
        is_min = (t1 >= t2) & (t2 <= t3) & (col[:, :-2] + 2 < n_k[:, None])
        d1 = t1 - t2
        d3 = t3 - t2
        ssum = d1 + d3
        flat = ssum <= 0
        ssafe = jnp.where(flat, 1.0, ssum)
        o = jnp.clip((d1 - d3) / (2.0 * ssafe), -0.5, 0.5)
        o = jnp.where(flat, 0.0, o)
        val = t2 + (0.5 * ssum) * o * o + (0.5 * (d3 - d1)) * o
        pos = o + (col[:, :-2] + 1).astype(dt)
        val = jnp.where(is_min, val, _BIG)
        jbest = jnp.argmin(val, axis=1)
        v_loc = jnp.take_along_axis(val, jbest[:, None], axis=1)[:, 0]
        p_loc = jnp.take_along_axis(pos, jbest[:, None], axis=1)[:, 0]
        use_loc = v_loc < best_val
        best_pos = jnp.where(use_loc, p_loc, best_pos)

        wq = lo + jnp.minimum(best_pos * stride, hi - lo)
        new_x = pick(c0, wq, wq, wq)
        new_y = pick(wq, c1 - wq, c2, wq + c3)

        # terminations: plane left the grid (:3172, :3294) -> finish early
        plane_oob = ((dir_index == 0) & oob0) | ((dir_index == 2) & oob2)
        # increasing travel time to receiver -> truncate (:3406-3423).
        # tt at the rounded *last* point is carried from the previous
        # step's new-point sample (identical coordinates/values), saving
        # one 4-gather bilinear sample per iteration.
        if k_step == 1:
            tt_new_pt = sample_b(
                ttf_index, jnp.round(new_x), jnp.round(new_y)
            )
        else:
            # fast path: reuse the already-sampled plane TT at the integer
            # candidate nearest the refined minimum (within stride/2 fine
            # cells of the reference's rounded-point sample) instead of a
            # fresh 4-gather bilinear sample of the TTF stack
            col_b = jnp.clip(
                jnp.round(best_pos).astype(jnp.int32), 0, K - 1
            )
            tt_new_pt = jnp.take_along_axis(
                tt_plane, col_b[:, None], axis=1
            )[:, 0]
        increasing = tt_last_pt < tt_new_pt

        reason = jnp.where(
            done, reason,
            jnp.where(plane_oob, 1, jnp.where(increasing, 2, reason)),
        )
        stop = done | plane_oob | increasing
        add = ~stop

        bx = bx.at[ridx, length].set(jnp.where(add, new_x, bx[ridx, length]))
        by = by.at[ridx, length].set(jnp.where(add, new_y, by[ridx, length]))
        vec_x = jnp.where(add, new_x - last_x, vec_x)
        vec_y = jnp.where(add, new_y - last_y, vec_y)
        last_x = jnp.where(add, new_x, last_x)
        last_y = jnp.where(add, new_y, last_y)
        length = jnp.where(add, length + 1, length)
        tt_last_pt = jnp.where(add, tt_new_pt, tt_last_pt)

        # arrival test for the *next* iteration (:3156)
        arrived = (last_x - rec_x) ** 2 + (last_y - rec_y) ** 2 <= (
            1.6 * s
        ) ** 2
        done = stop | arrived
        return (last_x, last_y, vec_x, vec_y, bx, by, length, done,
                reason, tt_last_pt, k + 1)

    bx = jnp.zeros((R, P), dt)
    by = jnp.zeros((R, P), dt)
    bx = bx.at[:, 0].set(src_x)
    by = by.at[:, 0].set(src_y)
    arrived0 = (src_x - rec_x) ** 2 + (src_y - rec_y) ** 2 <= (1.6 * s) ** 2
    tt_src = sample_b(ttf_index, jnp.round(src_x), jnp.round(src_y))
    state = (
        src_x, src_y, rec_x - src_x, rec_y - src_y, bx, by,
        jnp.ones((R,), jnp.int32), arrived0, jnp.zeros((R,), jnp.int32),
        tt_src, jnp.asarray(0),
    )

    def cond(state):
        done = state[7]
        k = state[10]
        return (~jnp.all(done)) & (k < max_steps)

    state = jax.lax.while_loop(cond, step, state)
    last_x, last_y, _, _, bx, by, length, _, reason, _, _ = state

    # append the receiver (:3453-3457)
    ridx = jnp.arange(R)
    bx = bx.at[ridx, length].set(rec_x)
    by = by.at[ridx, length].set(rec_y)
    length = length + 1

    # optional Fermat relaxation recovers the h^2 chord error of long
    # marching strides (see relax_rays)
    # segment_time now enumerates crossings PER AXIS (sorted closed form),
    # so the slot budget is the per-axis span of the longest segment
    # (~k_eff cells + relaxation offsets), not the old combined count
    final_cross = max(-(-max_cross // 2) + 1, k_eff + 4)
    if relax_iters > 0:
        bx, by = relax_rays(
            model, mat_flat, bx, by, length, s,
            iters=relax_iters, max_cross=final_cross,
            quad=relax_quad, chunk=min(P - 2, 256),
        )
    times = ray_times(model, mat_flat, bx, by, length, s, final_cross,
                      chunk=min(P - 1, 256))
    if return_reason:
        return bx, by, length, times, reason
    return bx, by, length, times


@partial(
    jax.jit,
    static_argnames=(
        "subgrid_size", "mode", "max_steps", "max_cross", "step_scale",
        "relax_iters", "relax_quad", "return_reason", "score_k",
        "score_stride",
    ),
)
def trace_rays_descent(
    model: gridlib.Model,
    rec_ttf,
    ttf_index,
    source_xy,
    receiver_xy,
    subgrid_size: int,
    mode: str = "interp",
    max_steps: int | None = None,
    max_cross: int = 16,
    step_scale: float = 6.0,
    relax_iters: int = 2,
    relax_quad: bool | int = True,
    return_reason: bool = False,
    score_k: int = 0,
    score_stride: float = 1.0,
):
    """Characteristic-descent ray marching: the fast TPU-native tracer.

    Where the reference (and trace_rays) runs a Fermat plane search per
    step -- scoring dozens of candidate points with segment integrations --
    this marcher steps directly along the ray (group-velocity) direction
    derived from the travel-time gradient:

      * ``grad T`` of the receiver field is the phase-slowness vector
        (eikonal), so the local phase direction is one bilinear-gradient
        sample (4 gathers);
      * the group direction follows by rotating the phase direction by the
        precomputed material skew ``atan((dv_p/dphi)/v_p)`` (Model.ray_skew,
        one table lookup) -- equal to zero in isotropic cells, where this
        reduces to steepest descent (the design suggested by SURVEY.md
        section 7 step 5).

    Per ray-step cost is ~6 gathered elements vs ~200+ for the plane
    search.  The marched polyline is then Fermat-relaxed (relax_rays) to
    polish off the O(h^2) chord error and integrated exactly (ray_times),
    so returned times use the same integrator as the reference
    (time_between_points, Anis_TTF_rays.py:2835-2989).

    ``score_k > 0`` adds a per-step *Fermat correction*: score_k candidate
    points spread ``score_stride`` coarse cells apart along the
    perpendicular of the descent step are scored with the plane search's
    exact criterion ``rec_TTF(p) + segment_time(last -> p)`` (Simpson
    form) and the quadratic-refined arg-min wins.  The descent direction
    is only used to *center and orient* the tiny search window, so the
    marcher keeps plane-search robustness at shocks -- where two arrival
    branches meet, the blended TTF gradient is unreliable, but the scored
    window locks onto the Fermat-optimal branch -- at ~score_k candidates
    per step instead of the reference's ~2*(3*subgrid+1)+1 (:3133-3136).

    Same signature/returns as trace_rays.  Requires a model with
    precomputed ray_curves/ray_skew (make_model does this).
    """
    if score_k > 0 and score_k % 2 == 0:
        # the improve-gate scores the window center as the descent point;
        # an even window has no center candidate (index k//2 sits half a
        # stride off-center), which would gate against the wrong score
        raise ValueError(f"score_k must be odd (got {score_k})")
    Z, X = model.shape
    s = int(subgrid_size)
    dt = model.vel_map.dtype
    R = source_xy.shape[0]
    ttf_index = jnp.asarray(ttf_index, jnp.int32)
    if mode == "grid":
        rows, cols = rec_ttf.shape[-2], rec_ttf.shape[-1]
    else:
        rows, cols = (Z - 1) * s + 1, (X - 1) * s + 1
    if max_steps is None:
        max_steps = int(-(-5 * (Z + X) // max(1.0, float(step_scale))))
    P = max_steps + 2
    h_far = float(step_scale) * s

    veln_flat = model.veln.reshape(-1)
    cls_flat = model.ray_curve_idx.reshape(-1)
    mat_flat = _material_flat(model)

    src_x = source_xy[:, 0].astype(dt)
    src_y = source_xy[:, 1].astype(dt)
    rec_x = receiver_xy[:, 0].astype(dt)
    rec_y = receiver_xy[:, 1].astype(dt)

    # Flat-gather TTF samplers (see trace_rays sample_b: the vmapped
    # per-ray dynamic-slice form is ~7x slower on TPU).
    TZ, TX = rec_ttf.shape[-2], rec_ttf.shape[-1]
    flat_all = rec_ttf.reshape(-1)
    t_off = (
        ttf_index.astype(jnp.int32) * (TZ * TX)
        if rec_ttf.ndim == 3
        else jnp.zeros(ttf_index.shape, jnp.int32)
    )
    s_grid = 1.0 if mode == "grid" else float(s)

    def _corners(x, y):
        off = t_off.reshape(t_off.shape + (1,) * (x.ndim - 1))
        cx = jnp.clip(x / s_grid, 0.0, TX - 1.0)
        cy = jnp.clip(y / s_grid, 0.0, TZ - 1.0)
        x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, TX - 2)
        y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, TZ - 2)
        fx = (cx - x0).astype(dt)
        fy = (cy - y0).astype(dt)
        base = off + y0 * TX + x0
        v00 = jnp.take(flat_all, base)
        v01 = jnp.take(flat_all, base + 1)
        v10 = jnp.take(flat_all, base + TX)
        v11 = jnp.take(flat_all, base + TX + 1)
        return v00, v01, v10, v11, fx, fy

    def grad_b(_t_idx, x, y):
        v00, v01, v10, v11, fx, fy = _corners(x, y)
        t = (
            v00 * (1 - fy) * (1 - fx)
            + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx)
            + v11 * fy * fx
        )
        gx = ((1 - fy) * (v01 - v00) + fy * (v11 - v10)) / s_grid
        gy = ((1 - fx) * (v10 - v00) + fx * (v11 - v01)) / s_grid
        return t, gx, gy

    def _ttf_b(x, y):
        v00, v01, v10, v11, fx, fy = _corners(x, y)
        return (
            v00 * (1 - fy) * (1 - fx)
            + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx)
            + v11 * fy * fx
        )

    def step(state):
        last_x, last_y, bx, by, length, done, reason, k = state

        _, gx, gy = grad_b(ttf_index, last_x, last_y)
        gnorm = jnp.sqrt(gx * gx + gy * gy)
        stalled = gnorm <= 0.0
        gsafe = jnp.where(stalled, 1.0, gnorm)
        nx_, ny_ = gx / gsafe, gy / gsafe         # phase direction (unit)

        # material skew at the current cell: geometric group angle =
        # phase angle - skew(phi), phi = veln - theta_p (the reference's
        # effective-angle convention, Anis_TTF_rays.py:2950-2978)
        xi = jnp.clip(jnp.round(last_x / s).astype(jnp.int32), 0, X - 1)
        yi = jnp.clip(jnp.round(last_y / s).astype(jnp.int32), 0, Z - 1)
        cell = yi * X + xi
        veln_c = jnp.take(veln_flat, cell)
        cls_c = jnp.take(cls_flat, cell)
        theta_p = jnp.degrees(jnp.arctan2(gy, gx))
        phi = veln_c - theta_p
        # gather interp on purpose: see _group_velocity_cell
        d_mat = mats.interp_table_gather(
            model.ray_skew, phi, cls_c, jnp.asarray(1.0, dt),
        )
        dg = -d_mat * (np.pi / 180.0)
        cd, sd_ = jnp.cos(dg), jnp.sin(dg)
        # group direction; the ray marches opposite it (toward receiver)
        dir_x = -(cd * nx_ - sd_ * ny_)
        dir_y = -(cd * ny_ + sd_ * nx_)

        # near-receiver handling like the plane search: gentle stride
        # inside (step_scale + 3) * s, straight snap inside 4 * s
        dx_r = rec_x - last_x
        dy_r = rec_y - last_y
        near2 = dx_r * dx_r + dy_r * dy_r
        near = jnp.sqrt(near2)
        off = jnp.where(
            near2 < ((float(step_scale) + 3.0) * s) ** 2, float(s), h_far
        )
        snap = near2 < (4.0 * s) ** 2
        nsafe = jnp.where(near == 0, 1.0, near)
        dir_x = jnp.where(snap, dx_r / nsafe, dir_x)
        dir_y = jnp.where(snap, dy_r / nsafe, dir_y)
        hit = snap & (near <= off)

        new_x = jnp.clip(last_x + off * dir_x, 0.0, cols - 1.0)
        new_y = jnp.clip(last_y + off * dir_y, 0.0, rows - 1.0)
        if score_k > 0:
            # Fermat-scored lateral window centered on the descent point
            half = (score_k - 1) / 2.0
            lat = (jnp.arange(score_k, dtype=dt) - half) * (
                float(score_stride) * s
            )
            px, py = -dir_y, dir_x               # unit perpendicular
            cx = jnp.clip(
                new_x[:, None] + lat[None, :] * px[:, None], 0.0, cols - 1.0
            )
            cy = jnp.clip(
                new_y[:, None] + lat[None, :] * py[:, None], 0.0, rows - 1.0
            )
            t_c = _ttf_b(cx, cy)
            seg = segment_time_quad(
                model, mat_flat, last_x[:, None], last_y[:, None], cx, cy, s
            )
            score = t_c + seg
            # Gate: only correct when the window min beats the descent
            # point by more than the flat-valley noise floor (the Fermat
            # score is 2nd-order flat across the true ray, so bilinear
            # interpolation error shifts its arg-min by O(1) cells in
            # smooth media -- real branch errors at shocks score orders
            # of magnitude larger).
            s_center = score[:, score_k // 2]
            seg_center = seg[:, score_k // 2]
            kb = jnp.argmin(score, axis=1)
            km = jnp.maximum(kb - 1, 0)
            kp = jnp.minimum(kb + 1, score_k - 1)
            ridx0 = jnp.arange(R)
            s0 = score[ridx0, kb]
            sm = score[ridx0, km]
            sp = score[ridx0, kp]
            den = sm - 2.0 * s0 + sp
            delta = jnp.where(
                den > 0.0,
                0.5 * (sm - sp) / jnp.where(den == 0.0, 1.0, den),
                0.0,
            )
            woff = (kb.astype(dt) - half + jnp.clip(delta, -1.0, 1.0)) * (
                float(score_stride) * s
            )
            improve = (s_center - score[ridx0, kb]) > 1e-3 * seg_center
            woff = jnp.where(improve, woff, 0.0)
            woff = jnp.where(snap, 0.0, woff)    # snap path stays straight
            new_x = jnp.clip(new_x + woff * px, 0.0, cols - 1.0)
            new_y = jnp.clip(new_y + woff * py, 0.0, rows - 1.0)
        new_x = jnp.where(hit, rec_x, new_x)
        new_y = jnp.where(hit, rec_y, new_y)

        reason = jnp.where(done, reason, jnp.where(stalled, 1, reason))
        stop = done | stalled
        add = ~stop
        ridx = jnp.arange(R)
        bx = bx.at[ridx, length].set(jnp.where(add, new_x, bx[ridx, length]))
        by = by.at[ridx, length].set(jnp.where(add, new_y, by[ridx, length]))
        last_x = jnp.where(add, new_x, last_x)
        last_y = jnp.where(add, new_y, last_y)
        length = jnp.where(add, length + 1, length)

        arrived = (last_x - rec_x) ** 2 + (last_y - rec_y) ** 2 <= (
            1.6 * s
        ) ** 2
        done = stop | arrived
        return (last_x, last_y, bx, by, length, done, reason, k + 1)

    bx = jnp.zeros((R, P), dt)
    by = jnp.zeros((R, P), dt)
    bx = bx.at[:, 0].set(src_x)
    by = by.at[:, 0].set(src_y)
    arrived0 = (src_x - rec_x) ** 2 + (src_y - rec_y) ** 2 <= (1.6 * s) ** 2
    state = (
        src_x, src_y, bx, by, jnp.ones((R,), jnp.int32), arrived0,
        jnp.zeros((R,), jnp.int32), jnp.asarray(0),
    )

    def cond(state):
        done = state[5]
        k = state[7]
        return (~jnp.all(done)) & (k < max_steps)

    state = jax.lax.while_loop(cond, step, state)
    _, _, bx, by, length, _, reason, _ = state

    ridx = jnp.arange(R)
    bx = bx.at[ridx, length].set(rec_x)
    by = by.at[ridx, length].set(rec_y)
    length = length + 1

    relax_cross = max(max_cross, int(2 * step_scale) + 6)
    if relax_iters > 0:
        bx, by = relax_rays(
            model, mat_flat, bx, by, length, s,
            iters=relax_iters, max_cross=relax_cross, quad=relax_quad,
        )
    times = ray_times(model, mat_flat, bx, by, length, s, relax_cross,
                      chunk=min(P - 1, 256))
    if return_reason:
        return bx, by, length, times, reason
    return bx, by, length, times


def trace_rays_auto(
    model: gridlib.Model,
    rec_ttf,
    ttf_index,
    source_xy,
    receiver_xy,
    subgrid_size: int,
    mode: str = "interp",
    tol: float = 3e-3,
    retrace_chunk: int = 128,
    descent_kw: dict | None = None,
    search_kw: dict | None = None,
):
    """Fast tracer with a certified fallback (host-level driver).

    1. March every ray with the characteristic-descent tracer
       (trace_rays_descent) -- cheap, but can lock onto the wrong arrival
       branch where the receiver field has a shock (two branches meeting).
    2. *Verify*: the receiver TTF sampled at the source IS the true
       first-arrival time, and any path integral is an upper bound on it
       (Fermat), so ``time > (1 + tol) * TTF(src)`` provably identifies
       every suboptimal ray -- no false negatives up to the solver
       field's own discretization error (which is folded into ``tol``).
    3. Retrace only the flagged rays with the reference-parity plane
       search (trace_rays), in fixed-size chunks so XLA compiles one
       fallback program regardless of how many rays need it.  The exact
       1-cell fallback geometry is deliberate: fast configurations
       (long strides + Simpson scoring) can miss large refraction
       detours on sharp-contrast models, which is exactly when the
       certificate fires.  It is also expensive on large grids (its step
       buffer is the reference's 5*(Z+X) bound); pass ``search_kw``
       (e.g. ``dict(step_scale=3, quad_vel=True, relax_iters=2,
       cand_stride=3.0)``) to trade fallback accuracy for speed.
       A retraced ray replaces the descent ray only when its (exactly
       integrated) time is lower, so the result never regresses.

    Returns (ray_x, ray_y, lengths, times) like trace_rays, padded to the
    wider of the two tracers' step buffers.
    """
    descent_kw = dict(descent_kw or {})
    search_kw = dict(search_kw or {})
    ttf_index = jnp.asarray(ttf_index, jnp.int32)
    s = int(subgrid_size)

    bx, by, lens, times = trace_rays_descent(
        model, rec_ttf, ttf_index, source_xy, receiver_xy, s, mode=mode,
        **descent_kw,
    )

    def _t_src(t_idx, x, y):
        tt = rec_ttf[t_idx] if rec_ttf.ndim == 3 else rec_ttf
        return _sample_ttf(tt, x, y, s, mode)

    t_true = jax.vmap(_t_src)(
        ttf_index, source_xy[:, 0], source_xy[:, 1]
    )
    # NaN-safe: a descent ray whose integration produced NaN (e.g. a path
    # clipped through an INF region) must also take the fallback, so flag
    # everything NOT provably within tolerance.
    bad = ~np.asarray(times <= (1.0 + tol) * t_true)
    if not bad.any():
        return bx, by, lens, times

    bx = np.array(bx)
    by = np.array(by)
    lens = np.array(lens)
    times = np.array(times)
    idx = np.nonzero(bad)[0]
    n_chunks = -(-len(idx) // retrace_chunk)
    padded = np.resize(idx, n_chunks * retrace_chunk)
    for c in range(n_chunks):
        sub = padded[c * retrace_chunk : (c + 1) * retrace_chunk]
        rbx, rby, rlens, rtimes = trace_rays(
            model, rec_ttf, ttf_index[sub],
            jnp.asarray(source_xy)[sub], jnp.asarray(receiver_xy)[sub], s,
            mode=mode, **search_kw,
        )
        rbx = np.asarray(rbx)
        rby = np.asarray(rby)
        W = bx.shape[1]
        if rbx.shape[1] > W:
            bx = np.pad(bx, ((0, 0), (0, rbx.shape[1] - W)))
            by = np.pad(by, ((0, 0), (0, rbx.shape[1] - W)))
        uniq = sub if c + 1 < n_chunks else np.unique(sub)
        pos = {int(r): k for k, r in enumerate(sub)}
        rtimes = np.asarray(rtimes)
        rlens = np.asarray(rlens)
        for r in uniq:
            k = pos[int(r)]
            # both tracers integrate times exactly, so the lower time is
            # provably the better Fermat path; keep the descent ray when
            # the retrace did not improve it (NaN descent always loses)
            if not (rtimes[k] < times[r] or np.isnan(times[r])):
                continue
            bx[r, : rbx.shape[1]] = rbx[k]
            by[r, : rby.shape[1]] = rby[k]
            lens[r] = rlens[k]
            times[r] = rtimes[k]
    return (jnp.asarray(bx), jnp.asarray(by), jnp.asarray(lens),
            jnp.asarray(times))


def split_at_cell_boundaries(ray_x, ray_y, max_cross_per_seg: int = 16):
    """Split a ray polyline so there is a vertex at every grid-cell-boundary
    crossing (the reference's travel_times utility,
    Anis_TTF_rays.py:3025-3101), as fixed-width padded arrays.

    ``ray_x``/``ray_y``: (P,) vertex coordinates (original-grid units like
    the reference).  Returns (xs, ys, valid): (P-1, max_cross_per_seg)
    arrays of intermediate points per segment plus a validity mask; the
    flattened valid points, prefixed with the first vertex, reproduce the
    reference's output order.
    """
    x1, x2 = ray_x[:-1], ray_x[1:]
    y1, y2 = ray_y[:-1], ray_y[1:]
    dt = jnp.result_type(ray_x, jnp.float32)

    dx_zero = x2 == x1
    m = jnp.where(dx_zero, 0.0, (y2 - y1) / jnp.where(dx_zero, 1.0, x2 - x1))
    c = y1 - m * x1
    dir_x = jnp.where(x1 < x2, 1.0, -1.0)
    dir_y = jnp.where(y1 < y2, 1.0, -1.0)

    def body(state, _):
        next_x, next_y, fin_x, fin_y = state
        done = fin_x & fin_y
        past_x = ((next_x > x2) & (dir_x == 1)) | ((next_x < x2) & (dir_x == -1))
        fin_x2 = fin_x | past_x
        next_x = jnp.where(past_x & ~fin_x, x2, next_x)
        past_y = ((next_y > y2) & (dir_y == 1)) | ((next_y < y2) & (dir_y == -1))
        fin_y2 = fin_y | past_y
        next_y = jnp.where(past_y & ~fin_y, y2, next_y)
        m_safe = jnp.where(m == 0, 1.0, m)
        nxy = m * next_x + c
        nyx = (next_y - c) / m_safe
        dxc = (x1 - next_x) ** 2 + (y1 - nxy) ** 2
        dyc = (x1 - nyx) ** 2 + (y1 - next_y) ** 2
        take_x = jnp.where(dx_zero, False, jnp.where(m == 0, True, dxc < dyc))
        px = jnp.where(dx_zero, x1, jnp.where(take_x, next_x, nyx))
        py = jnp.where(dx_zero, next_y, jnp.where(take_x, nxy, next_y))
        next_x = jnp.where(take_x & ~dx_zero, next_x + dir_x, next_x)
        next_y = jnp.where((~take_x) | dx_zero, next_y + dir_y, next_y)
        return (next_x, next_y, fin_x2, fin_y2), (px, py, ~done)

    state = (
        jnp.round(x1) + dir_x * 0.5,
        jnp.round(y1) + dir_y * 0.5,
        jnp.zeros_like(x1, bool),
        jnp.zeros_like(x1, bool),
    )
    _, (xs, ys, valid) = jax.lax.scan(
        body, state, None, length=max_cross_per_seg
    )
    return (
        jnp.moveaxis(xs, 0, 1).astype(dt),
        jnp.moveaxis(ys, 0, 1).astype(dt),
        jnp.moveaxis(valid, 0, 1),
    )
