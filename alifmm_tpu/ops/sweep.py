"""Parallel-sweep driver: the TPU replacement for heap-ordered marching.

The reference finalises one point per heap pop (strictly sequential,
Anis_TTF_rays.py:2055-2102).  Here the same local update runs on whole grid
lines at once, ordered as four directional Gauss-Seidel sweeps (down / up /
left / right) per pass, iterated to a fixed point.  Information propagates
across the full grid in O(1) passes for monotone characteristics; curved
(anisotropic) rays converge in a few passes.

Each sweep is a ``lax.scan`` whose carry holds the two most recently updated
lines; the scanned step rebuilds the 5-line neighbourhood band and applies
``stencils.local_update`` to one line (vectorised over the line and over any
leading batch/source dims).  Up/left/right sweeps reuse the same step with
``reverse=True`` and/or column bands -- the stencil geometry is never
mirrored, so selection tie-breaks stay bit-identical to the reference in
all four directions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from . import stencils
from .stencils import INF, OFFSETS

__all__ = ["gs_pass", "solve_fixpoint", "jacobi_pass"]


def _width_masks(W, axis):
    """Static width-direction masks: in-bounds per offset component, and the
    two width-end edge masks."""
    iw = jnp.arange(W)
    ok = {d: (iw + d >= 0) & (iw + d <= W - 1) for d in (-2, -1, 0, 1, 2)}
    first = iw == 0
    last = iw == W - 1
    return ok, first, last


def _band_step(band, W, axis, z_ok, edges, wok, center, model, dnx,
               causal=True):
    """Update the centre line of a 5-line band.

    ``band``: (..., 5, W + 4) padded with INF in the width direction.
    ``axis`` = 'z': band index is dz, width index is dx (row sweeps);
    ``axis`` = 'x': band index is dx, width index is dz (column sweeps).
    ``z_ok``: dict of per-step scalars: band-direction offset in bounds.
    ``edges``: dict of the four boundary masks for the centre line.
    ``wok``: static width-direction in-bounds masks.
    ``center``: dict of centre-line material fields.
    """
    tt_center = band[..., 2, 2 : 2 + W]
    nbr, known, inb = {}, {}, {}
    for (dz, dx) in OFFSETS:
        db, dw = (dz, dx) if axis == "z" else (dx, dz)
        v = band[..., 2 + db, 2 + dw : 2 + dw + W]
        nbr[(dz, dx)] = v
        k = v < INF * 0.5
        if causal:
            # Emulate the heap's knowledge state: when the reference
            # freezes a point at time t, only neighbours that froze earlier
            # (t_nbr < t) were "alive" and usable (nsts tests throughout
            # update()/fouds18_A()).  Restricting the usable set to the
            # upwind points reproduces the reference's partial-knowledge
            # stencil *selection*, which full-knowledge evaluation cannot
            # (the min-difference rule would pick downwind stencils).
            k = k & (v < tt_center)
        known[(dz, dx)] = k
        inb[(dz, dx)] = z_ok[db] & wok[dw]
    return stencils.local_update(
        nbr,
        known,
        inb,
        tt_center,
        center["veln"],
        center["velpn"],
        center["vel_map"],
        center["stif"],
        center["fbs"],
        edges,
        model,
        dnx,
        causal,
    )


def _sweep(
    tt,
    model: gridlib.Model,
    fixed,
    axis: str,
    reverse: bool,
    causal: bool = True,
    accumulate: str = "min",
):
    """One directional Gauss-Seidel line sweep over ``tt`` (..., Z, X)."""
    Z, X = tt.shape[-2], tt.shape[-1]
    if axis == "z":
        L, W = Z, X
        lines = jnp.moveaxis(tt, -2, 0)          # (L, ..., W)
        fixed_l = jnp.moveaxis(fixed, -2, 0)
        mats = dict(
            veln=model.veln,
            velpn=model.velpn,
            vel_map=model.vel_map,
            stif=model.stif,
            fbs=jnp.moveaxis(model.fallback_slowness, 1, 0),  # (Z, 4, X)
        )
    else:
        L, W = X, Z
        lines = jnp.moveaxis(tt, -1, 0)          # (L, ..., W)
        fixed_l = jnp.moveaxis(fixed, -1, 0)
        mats = dict(
            veln=model.veln.T,
            velpn=model.velpn.T,
            vel_map=model.vel_map.T,
            stif=jnp.moveaxis(model.stif, 1, 0),            # (X, Z, 5)
            fbs=jnp.moveaxis(model.fallback_slowness, 2, 0),  # (X, 4, Z)
        )

    wok, wfirst, wlast = _width_masks(W, axis)
    pad_w = [(0, 0)] * (lines.ndim - 1) + [(2, 2)]
    lines_p = jnp.pad(lines, pad_w, constant_values=INF)

    li = jnp.arange(L)
    inf_line = jnp.full(lines_p.shape[1:], INF, dtype=tt.dtype)

    def shift(n):
        """Old lines at offset n from the scan position (INF off the ends)."""
        if n == 0:
            return lines_p
        if n > 0:
            return jnp.concatenate(
                [lines_p[n:]] + [inf_line[None]] * n, axis=0
            )
        return jnp.concatenate(
            [inf_line[None]] * (-n) + [lines_p[:n]], axis=0
        )

    # Forward sweeps take already-updated lines from the carry on the -1/-2
    # side and old lines on the +1/+2 side; reverse sweeps the opposite.
    if not reverse:
        xs = dict(old0=lines_p, oldA=shift(1), oldB=shift(2))
    else:
        xs = dict(old0=lines_p, oldA=shift(-1), oldB=shift(-2))
    xs.update(mats=mats, fixed=fixed_l, idx=li)

    def step(carry, x):
        # carry = (line two steps back in scan order, line one step back),
        # both already updated and padded.
        m2, m1 = carry
        if not reverse:
            band = jnp.stack([m2, m1, x["old0"], x["oldA"], x["oldB"]], axis=-2)
        else:
            band = jnp.stack([x["oldB"], x["oldA"], x["old0"], m1, m2], axis=-2)
        i = x["idx"]
        z_ok = {d: (i + d >= 0) & (i + d <= L - 1) for d in (-2, -1, 0, 1, 2)}
        if axis == "z":
            edges = dict(
                top=(i == 0), bottom=(i == L - 1), left=wfirst, right=wlast
            )
        else:
            edges = dict(
                left=(i == 0), right=(i == L - 1), top=wfirst, bottom=wlast
            )
        new = _band_step(
            band, W, axis, z_ok, edges, wok, x["mats"], model, model.dnx,
            causal,
        )
        old_center = x["old0"][..., 2 : 2 + W]
        if accumulate == "min":
            # Label-correcting accumulation: the raw local update has
            # replace semantics (it may raise a value), which is only stable
            # under the reference's causal heap ordering.  Under parallel
            # sweeps we keep the monotone-from-above envelope instead; the
            # fixed point is the same first-arrival (viscosity) solution.
            new = jnp.minimum(old_center, new)
        else:  # replace (polish passes): keep old value where no candidate
            new = jnp.where(new < INF * 0.5, new, old_center)
        new = jnp.where(x["fixed"], old_center, new)
        new_p = jnp.pad(
            new, [(0, 0)] * (new.ndim - 1) + [(2, 2)], constant_values=INF
        )
        return (m1, new_p), new

    (_, _), out = jax.lax.scan(step, (inf_line, inf_line), xs, reverse=reverse)
    if axis == "z":
        return jnp.moveaxis(out, 0, -2)
    return jnp.moveaxis(out, 0, -1)


def gs_pass(tt, model: gridlib.Model, fixed, causal=True, accumulate="min"):
    """One full Gauss-Seidel pass: down, up, right, left line sweeps."""
    tt = _sweep(tt, model, fixed, "z", False, causal, accumulate)
    tt = _sweep(tt, model, fixed, "z", True, causal, accumulate)
    tt = _sweep(tt, model, fixed, "x", False, causal, accumulate)
    tt = _sweep(tt, model, fixed, "x", True, causal, accumulate)
    return tt


def jacobi_pass(tt, model: gridlib.Model, fixed):
    """One whole-grid Jacobi pass (no line ordering), with the same
    monotone min-accumulation as the line sweeps."""
    return jnp.minimum(tt, stencils.full_grid_update(tt, model, fixed))


def solve_fixpoint(
    tt0,
    model: gridlib.Model,
    fixed,
    rel_tol: float = 1e-6,
    max_passes: int = 50,
    min_passes: int = 2,
    polish_passes: int = 5,
):
    """Two-phase solve to the first-arrival field.

    Phase 1 iterates causal (upwind-restricted, min-accumulating)
    Gauss-Seidel passes until the max update falls below rel_tol * max time
    -- a stable label-correcting scheme that lands slightly *below* the
    reference FMM values (its transient usable sets are larger than the
    heap's).  Phase 2 runs ``polish_passes`` replace-semantics sweeps, still
    with the upwind knowledge restriction: each point recomputes from
    strictly-earlier neighbours only, which reproduces the reference's
    freeze-time stencil selection and converges monotonically up to the
    heap-march field (validated to ~2e-3 L-inf / 8e-4 mean on seeded
    problems; never overshoots).

    Runs under jit; the convergence test is a scalar reduce inside a
    lax.while_loop so no host sync happens per pass.
    """

    def cond(state):
        tt, prev, k = state
        known = tt < INF * 0.5
        delta = jnp.max(jnp.where(known | (prev < INF * 0.5),
                                  jnp.abs(tt - prev), 0.0))
        scale = jnp.max(jnp.where(known, tt, 0.0))
        not_conv = delta > rel_tol * jnp.maximum(scale, 1e-30)
        return (k < max_passes) & (not_conv | (k < min_passes))

    def body(state):
        tt, _, k = state
        new = gs_pass(tt, model, fixed)
        return (new, tt, k + 1)

    # prev primed so cond() sees a large delta; avoids tracing an extra
    # gs_pass instance outside the loop (compile-time win).
    init = (tt0, tt0 + 1.0, jnp.asarray(0))
    tt, _, n = jax.lax.while_loop(cond, body, init)

    def polish_body(_, t):
        return gs_pass(t, model, fixed, causal=True, accumulate="replace")

    tt = jax.lax.fori_loop(0, polish_passes, polish_body, tt)
    return tt, n
