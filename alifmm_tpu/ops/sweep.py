"""Parallel-sweep driver: the TPU replacement for heap-ordered marching.

The reference finalises one point per heap pop (strictly sequential,
Anis_TTF_rays.py:2055-2102).  Here the same local update runs on whole grid
lines at once, ordered as four directional Gauss-Seidel sweeps (down / up /
left / right) per pass, iterated to a fixed point.

Two key mechanisms make the parallel iteration reproduce the heap march:

* **Upwind-restricted knowledge.**  When the heap freezes a point at time
  t, only earlier-frozen neighbours (t_nbr < t) were usable; the
  min-difference stencil selection depends on that partial-knowledge state.
  Each sweep update therefore masks the usable set to ``t_nbr < t_center``.
* **Two accumulation phases.**  Phase 1 min-accumulates (a stable
  label-correcting envelope that lands slightly below the heap values,
  because transient usable sets are larger than the heap's); phase 2
  recomputes with replace semantics under the same restriction, converging
  monotonically up to the heap-march field (validated ~2e-3 L-inf / 8e-4
  mean on seeded problems; never overshoots).

Compile-time design: direction (forward/backward along an axis) and
accumulation (min/replace) are *traced* selects over shared data, not
structural variants, so each grid shape compiles exactly one scan body per
sweep axis; both phases run inside a single ``lax.while_loop``.
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from . import stencils
from .stencils import INF, OFFSETS

__all__ = ["gs_pass", "solve_fixpoint", "jacobi_pass", "SolveInfo"]


class SolveInfo(typing.NamedTuple):
    """Convergence record of one solve_fixpoint call (a jit-transparent
    pytree).  ``passes``: phase-1 sweep passes actually run; ``converged``:
    whether the phase-1 delta dropped below rel_tol before max_passes
    (False means the returned field may still be improvable -- e.g. qSV
    solves need far larger budgets than qP, see SolveConfig.for_mode)."""

    passes: jnp.ndarray
    converged: jnp.ndarray


def _width_masks(W, off=0, total=None):
    """In-bounds and edge masks along the width direction in *global*
    coordinates (off/total let sharded slabs keep the true grid's boundary
    semantics)."""
    total = W if total is None else total
    iw = jnp.arange(W) + off
    ok = {d: (iw + d >= 0) & (iw + d <= total - 1) for d in (-2, -1, 0, 1, 2)}
    first = iw == 0
    last = iw == total - 1
    return ok, first, last


def _band_step(band, W, axis, z_ok, edges, wok, center, model, dnx):
    """Update the centre line of a 5-line band (always in causal mode:
    upwind-restricted usable set + candidate >= inputs filter).

    ``band``: (..., 5, W + 4) padded with INF in the width direction,
    ordered [-2, -1, 0, +1, +2] in the band direction.
    ``axis`` = 'z': band index is dz, width index is dx (row sweeps);
    ``axis`` = 'x': band index is dx, width index is dz (column sweeps).
    """
    tt_center = band[..., 2, 2 : 2 + W]
    nbr, known, inb = {}, {}, {}
    for (dz, dx) in OFFSETS:
        db, dw = (dz, dx) if axis == "z" else (dx, dz)
        v = band[..., 2 + db, 2 + dw : 2 + dw + W]
        nbr[(dz, dx)] = v
        # Heap knowledge emulation: only neighbours that would already be
        # frozen (strictly earlier arrival) are usable -- this reproduces
        # the reference's partial-knowledge stencil selection.
        known[(dz, dx)] = (v < INF * 0.5) & (v < tt_center)
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
        causal=True,
    )


def _sweep_axis(tt, model: gridlib.Model, fixed, axis: str, rev, replace,
                scan_off=0, scan_total=None, width_off=0, width_total=None,
                block: int = 1, halo_axis: str | None = None):
    """One Gauss-Seidel line sweep along ``axis``.

    ``rev`` (traced bool): sweep direction -- realised by flipping the line
    order of the scanned data, never the in-line geometry, so stencil
    identities and tie-breaks stay exact in all four directions.
    ``replace`` (traced bool): phase-2 replace accumulation vs phase-1 min.
    ``scan_off``/``scan_total`` and ``width_off``/``width_total`` place the
    block in global grid coordinates so domain-decomposed slabs (halo
    sharding) keep exact boundary/in-bounds semantics.
    ``block`` (static): lines per scan step.  The inner ``block`` line
    updates are unrolled *sequentially* in the step body, so results are
    identical to block=1 (same op order per line); the scan just issues
    L/block dependent steps instead of L, amortising per-step dispatch
    latency -- the dominant cost of whole-grid sweeps on TPU.

    ``halo_axis`` (static, halo-sharded x-sweeps only): mesh axis name of
    a z-slab decomposition whose boundary runs along the WIDTH of these
    lines.  On one device, the carry lines (x-1, x-2) hold values updated
    *this sweep* at every z; a slab only computes its own rows, so after
    each line update the two interior rows adjacent to each boundary are
    ppermuted to the neighbouring slabs and spliced into the carry's halo
    slots -- the next line then reads exactly the values the single-device
    scan would have.  (The z-direction sweeps don't need this: their
    cross-boundary ordering is handled by pipelining the sweep across
    slabs, parallel/shard._halo_jacobi_block.)
    """
    Z, X = tt.shape[-2], tt.shape[-1]
    if axis == "z":
        L, W = Z, X
        lines = jnp.moveaxis(tt, -2, 0)
        fixed_l = jnp.moveaxis(fixed, -2, 0)
        mats = dict(
            veln=model.veln,
            velpn=model.velpn,
            vel_map=model.vel_map,
            stif=model.stif,
            fbs=jnp.moveaxis(model.fallback_slowness, 1, 0),
        )
    else:
        L, W = X, Z
        lines = jnp.moveaxis(tt, -1, 0)
        fixed_l = jnp.moveaxis(fixed, -1, 0)
        mats = dict(
            veln=model.veln.T,
            velpn=model.velpn.T,
            vel_map=model.vel_map.T,
            stif=jnp.moveaxis(model.stif, 1, 0),
            fbs=jnp.moveaxis(model.fallback_slowness, 2, 0),
        )

    L_tot = L if scan_total is None else scan_total
    wok, wfirst, wlast = _width_masks(W, width_off, width_total)

    def maybe_flip(x):
        return jnp.where(rev, jnp.flip(x, axis=0), x)

    lines = maybe_flip(lines)
    fixed_l = maybe_flip(fixed_l)
    mats = {k: maybe_flip(v) for k, v in mats.items()}
    idx = jnp.where(rev, jnp.arange(L)[::-1], jnp.arange(L)) + scan_off

    pad_w = [(0, 0)] * (lines.ndim - 1) + [(2, 2)]
    lines_p = jnp.pad(lines, pad_w, constant_values=INF)
    inf_line = jnp.full(lines_p.shape[1:], INF, dtype=tt.dtype)

    def shift(n):
        """Scanned lines n steps ahead in scan order (INF off the end)."""
        return jnp.concatenate([lines_p[n:]] + [inf_line[None]] * n, axis=0)

    xs = dict(
        old0=lines_p,
        oldA=shift(1),
        oldB=shift(2),
        mats=mats,
        fixed=fixed_l,
        idx=idx,
    )

    B = max(1, int(block))
    nb = -(-L // B)
    pad_l = nb * B - L
    if pad_l:
        # Scan-order tail padding: INF field lines marked fixed (so their
        # outputs are discarded values, never NaN via the fixed override),
        # edge-replicated materials (well-defined arithmetic), and an
        # out-of-range idx so every in-bounds mask of a padded row is
        # False.  Padded rows sit *last* in scan order, so no real row
        # ever consumes a padded row through the GS carry.
        def pad_tail(a, mode="inf"):
            cfg = [(0, pad_l)] + [(0, 0)] * (a.ndim - 1)
            if mode == "edge":
                return jnp.pad(a, cfg, mode="edge")
            if mode == "true":
                return jnp.pad(a, cfg, constant_values=True)
            return jnp.pad(a, cfg, constant_values=INF)

        xs = dict(
            old0=pad_tail(xs["old0"]),
            oldA=pad_tail(xs["oldA"]),
            oldB=pad_tail(xs["oldB"]),
            mats={k: pad_tail(v, "edge") for k, v in xs["mats"].items()},
            fixed=pad_tail(xs["fixed"], "true"),
            idx=jnp.pad(xs["idx"], (0, pad_l),
                        constant_values=L_tot + 10),
        )
    xs = jax.tree.map(lambda a: a.reshape((nb, B) + a.shape[1:]), xs)

    def one_line(m2, m1, x):
        # In scan order the carry lines are "behind" and oldA/oldB "ahead";
        # geometrically behind = -1/-2 for a forward sweep, +1/+2 for a
        # reverse one.  Both orderings come from the same traced values.
        band_fwd = jnp.stack([m2, m1, x["old0"], x["oldA"], x["oldB"]], -2)
        band_rev = jnp.stack([x["oldB"], x["oldA"], x["old0"], m1, m2], -2)
        band = jnp.where(rev, band_rev, band_fwd)
        i = x["idx"]
        z_ok = {
            d: (i + d >= 0) & (i + d <= L_tot - 1) for d in (-2, -1, 0, 1, 2)
        }
        if axis == "z":
            edges = dict(
                top=(i == 0), bottom=(i == L_tot - 1), left=wfirst,
                right=wlast,
            )
        else:
            edges = dict(
                left=(i == 0), right=(i == L_tot - 1), top=wfirst,
                bottom=wlast,
            )
        new = _band_step(
            band, W, axis, z_ok, edges, wok, x["mats"], model, model.dnx
        )
        old_center = x["old0"][..., 2 : 2 + W]
        acc_min = jnp.minimum(old_center, new)
        acc_rep = jnp.where(new < INF * 0.5, new, old_center)
        new = jnp.where(replace, acc_rep, acc_min)
        new = jnp.where(x["fixed"], old_center, new)
        new_p = jnp.pad(
            new, [(0, 0)] * (new.ndim - 1) + [(2, 2)], constant_values=INF
        )
        return new_p, new

    if halo_axis is not None:
        n_sl = jax.lax.axis_size(halo_axis)
        my_sl = jax.lax.axis_index(halo_axis)

        def refresh_carry(new):
            """Splice the neighbouring slabs' freshly-updated boundary
            rows of THIS line into its halo slots before it becomes the
            carry (single-device carry parity across the decomposition).
            """
            up = jax.lax.ppermute(
                new[..., W - 4 : W - 2], halo_axis,
                [(i, i + 1) for i in range(n_sl - 1)],
            )
            down = jax.lax.ppermute(
                new[..., 2:4], halo_axis,
                [(i + 1, i) for i in range(n_sl - 1)],
            )
            new = new.at[..., 0:2].set(
                jnp.where(my_sl == 0, jnp.full_like(up, INF), up)
            )
            new = new.at[..., W - 2 : W].set(
                jnp.where(my_sl == n_sl - 1, jnp.full_like(down, INF),
                          down)
            )
            return jnp.pad(
                new, [(0, 0)] * (new.ndim - 1) + [(2, 2)],
                constant_values=INF,
            )

    def step(carry, x):
        m2, m1 = carry  # two previously updated lines in scan order, padded
        outs = []
        for b in range(B):
            xb = jax.tree.map(lambda a: a[b], x)
            new_p, new = one_line(m2, m1, xb)
            if halo_axis is not None:
                new_p = refresh_carry(new)
            m2, m1 = m1, new_p
            outs.append(new)
        return (m2, m1), jnp.stack(outs, 0)

    (_, _), out = jax.lax.scan(step, (inf_line, inf_line), xs)
    out = out.reshape((nb * B,) + out.shape[2:])[:L]
    out = jnp.where(rev, jnp.flip(out, axis=0), out)
    if axis == "z":
        return jnp.moveaxis(out, 0, -2)
    return jnp.moveaxis(out, 0, -1)


def gs_pass_unshared(tt, model: gridlib.Model, fixed, replace=False,
                     block: int = 1):
    """One full Gauss-Seidel pass: down, up, right, left line sweeps.

    Four separate _sweep_axis instantiations (2 per axis); kept for
    reference/debugging -- gs_pass (the shared-body direction scan) is
    the production path and produces identical results.
    """
    replace = jnp.asarray(replace)
    f = jnp.asarray(False)
    t = jnp.asarray(True)
    tt = _sweep_axis(tt, model, fixed, "z", f, replace, block=block)
    tt = _sweep_axis(tt, model, fixed, "z", t, replace, block=block)
    tt = _sweep_axis(tt, model, fixed, "x", f, replace, block=block)
    tt = _sweep_axis(tt, model, fixed, "x", t, replace, block=block)
    return tt


def _pad_tail2(a, S, mode, cv=None, axes=(-2, -1)):
    """Pad the two grid axes of ``a`` (given by ``axes``) up to S x S."""
    cfg = [(0, 0)] * a.ndim
    for ax in axes:
        cfg[ax % a.ndim] = (0, S - a.shape[ax])
    if mode == "edge":
        return jnp.pad(a, cfg, mode="edge")
    return jnp.pad(a, cfg, constant_values=cv)


def gs_pass(tt, model: gridlib.Model, fixed, replace=False, block: int = 1,
            inner: int = 0, inner_use_ali: bool = False,
            use_ali: bool = True, use_fd: bool = True):
    """One full Gauss-Seidel pass: down, up, left, right line sweeps as a
    single ``lax.scan`` over the four directions.

    All four directional sweeps share ONE compiled line-update body: the
    grid is padded to an S x S square (S = max(Z, X); padded cells are
    fixed INF with all in-bounds masks false, so they never contribute),
    which makes the z-line and x-line layouts shape-identical -- the scan
    body selects between them with traced ``is_x`` / ``rev`` flags.  The
    per-line arithmetic, sweep order (z-fwd, z-rev, x-fwd, x-rev) and
    tie-breaks are exactly those of gs_pass_unshared; only the number of
    local_update instantiations changes (4*block -> block), which cuts the
    XLA compile time of every solver stage by ~4x.

    ``use_ali`` (static): False runs the strict sweeps with the pure
    multi-stencil FD update (monotone upwind, ~2x cheaper per line) --
    a phase-1 envelope option; the replace-mode polish must stay full-ALI
    to land on the validated field (see solve_fixpoint ``phase1_use_ali``).

    ``inner`` (static): 0 keeps the strict sequential in-block line order
    (result identical to block=1).  ``inner=J > 0`` switches the block
    body to J *parallel* Jacobi iterations over all ``block`` lines at
    once: every line updates simultaneously from the previous iteration's
    in-block values (carry lines for the first two, next block's old
    lines for the last two).  The stencil reaches 2 lines, so J >= B/2
    propagates information entering the block to its far edge -- same
    per-sweep front propagation as strict order at HALF the serial depth
    (J latencies per B lines instead of B).

    EXPERIMENTAL -- measured NOT profitable on the weld workload; keep 0
    for production.  Findings (round 2):

    * The parallel iteration is exact *at* a fixpoint (verified: one
      replace pass at the converged field is identical for inner=0 and
      inner=J), so the mechanism is sound.
    * Full-update (ALI) inner iterations min-lock undershoots: the ALI
      wavefront *interpolation* extrapolates below the true solution
      when fed same-iteration partial-knowledge neighbours, and neither
      more polish nor strictly-ordered polish recovers (the upwind
      restriction ``v < tt_center`` hides a cell's true upwind
      neighbours once its value falls below them) -- ~7e-3 mean
      deviation on a rough random-angle model.
    * FD-only inner iterations (use_ali=False, monotone upwind) avoid
      the min-lock but converge slowly, and the J-fold arithmetic
      per block step makes each pass ~J/2 x more *work*: the weld final
      stage is throughput-bound, not latency-bound (31 sources x 500
      width fills the VPU), so inner=4 measured 1.27 s vs 0.31 s for
      the strict order at worse accuracy.  A latency-dominated regime
      (single source, narrow grid) could still profit.
    """
    Z, X = tt.shape[-2], tt.shape[-1]
    S = max(Z, X)
    replace = jnp.asarray(replace)

    tt_sq = _pad_tail2(tt, S, "const", INF)
    fixed_sq = _pad_tail2(fixed, S, "const", True)
    veln_sq = _pad_tail2(model.veln, S, "edge")
    velpn_sq = _pad_tail2(model.velpn, S, "edge")
    vmap_sq = _pad_tail2(model.vel_map, S, "edge")
    stif_sq = _pad_tail2(model.stif, S, "edge", axes=(-3, -2))
    fbs_sq = _pad_tail2(model.fallback_slowness, S, "edge")

    # Line-major material layouts for both axes (see _sweep_axis): first
    # axis = scan axis.  Both variants of each plane share one shape, so
    # the direction body selects with jnp.where on the traced is_x flag.
    mats_z = dict(
        veln=veln_sq,
        velpn=velpn_sq,
        vel_map=vmap_sq,
        stif=stif_sq,
        fbs=jnp.moveaxis(fbs_sq, -2, 0),
    )
    mats_x = dict(
        veln=veln_sq.T,
        velpn=velpn_sq.T,
        vel_map=vmap_sq.T,
        stif=jnp.moveaxis(stif_sq, 1, 0),
        fbs=jnp.moveaxis(fbs_sq, -1, 0),
    )

    dirs = dict(
        rev=jnp.asarray([False, True, False, True]),
        is_x=jnp.asarray([False, False, True, True]),
        Lt=jnp.asarray([Z, Z, X, X]),
        Wt=jnp.asarray([X, X, Z, Z]),
    )

    iw = jnp.arange(S)
    B = max(1, int(block))
    # parallel-in-block iterations (0 = strict sequential order); needs at
    # least 2 lines per block for the carry/tail concatenations
    J = int(inner) if (inner and B >= 2) else 0
    nb = -(-S // B)
    pad_l = nb * B - S  # pad scan length to a block multiple
    Sp = nb * B

    def dir_step(tt_sq, d):
        rev, is_x, Lt, Wt = d["rev"], d["is_x"], d["Lt"], d["Wt"]

        # lines: (S, ..., S) with axis 0 = scan axis for both layouts
        lines = jnp.where(
            is_x, jnp.moveaxis(tt_sq, -1, 0), jnp.moveaxis(tt_sq, -2, 0)
        )
        fixed_l = jnp.where(
            is_x, jnp.moveaxis(fixed_sq, -1, 0), jnp.moveaxis(fixed_sq, -2, 0)
        )
        mats = {
            k: jnp.where(is_x, mats_x[k], mats_z[k]) for k in mats_z
        }

        def maybe_flip(x):
            return jnp.where(rev, jnp.flip(x, axis=0), x)

        lines = maybe_flip(lines)
        fixed_l = maybe_flip(fixed_l)
        mats = {k: maybe_flip(v) for k, v in mats.items()}
        idx = jnp.where(rev, iw[::-1], iw)

        pad_w = [(0, 0)] * (lines.ndim - 1) + [(2, 2)]
        lines_p = jnp.pad(lines, pad_w, constant_values=INF)
        inf_line = jnp.full(lines_p.shape[1:], INF, dtype=tt.dtype)

        def shift(n):
            return jnp.concatenate(
                [lines_p[n:]] + [inf_line[None]] * n, axis=0
            )

        wok = {dw: (iw + dw >= 0) & (iw + dw <= Wt - 1)
               for dw in (-2, -1, 0, 1, 2)}
        wfirst = iw == 0
        wlast = iw == Wt - 1

        xs = dict(
            old0=lines_p,
            oldA=shift(1),
            oldB=shift(2),
            mats=mats,
            fixed=fixed_l,
            idx=idx,
        )
        if pad_l:
            # INF field lines marked fixed, edge-replicated materials,
            # out-of-range idx: padded rows sit last in scan order and
            # never feed a real row through the GS carry.
            def pad_tail(a, mode="inf"):
                cfg = [(0, pad_l)] + [(0, 0)] * (a.ndim - 1)
                if mode == "edge":
                    return jnp.pad(a, cfg, mode="edge")
                if mode == "true":
                    return jnp.pad(a, cfg, constant_values=True)
                return jnp.pad(a, cfg, constant_values=INF)

            xs = dict(
                old0=pad_tail(xs["old0"]),
                oldA=pad_tail(xs["oldA"]),
                oldB=pad_tail(xs["oldB"]),
                mats={k: pad_tail(v, "edge") for k, v in xs["mats"].items()},
                fixed=pad_tail(xs["fixed"], "true"),
                idx=jnp.pad(xs["idx"], (0, pad_l), constant_values=S + 10),
            )
        xs = jax.tree.map(lambda a: a.reshape((nb, B) + a.shape[1:]), xs)

        def one_line(m2, m1, x):
            band_fwd = jnp.stack(
                [m2, m1, x["old0"], x["oldA"], x["oldB"]], -2
            )
            band_rev = jnp.stack(
                [x["oldB"], x["oldA"], x["old0"], m1, m2], -2
            )
            band = jnp.where(rev, band_rev, band_fwd)
            i = x["idx"]
            z_ok = {
                db: (i + db >= 0) & (i + db <= Lt - 1)
                for db in (-2, -1, 0, 1, 2)
            }
            line0 = jnp.broadcast_to(i == 0, (S,))
            lineN = jnp.broadcast_to(i == Lt - 1, (S,))
            edges = dict(
                top=jnp.where(is_x, wfirst, line0),
                bottom=jnp.where(is_x, wlast, lineN),
                left=jnp.where(is_x, line0, wfirst),
                right=jnp.where(is_x, lineN, wlast),
            )
            new = _band_step_traced(
                band, S, is_x, z_ok, edges, wok, x["mats"], model, model.dnx,
                use_ali=use_ali, use_fd=use_fd,
            )
            old_center = x["old0"][..., 2 : 2 + S]
            acc_min = jnp.minimum(old_center, new)
            acc_rep = jnp.where(new < INF * 0.5, new, old_center)
            new = jnp.where(replace, acc_rep, acc_min)
            new = jnp.where(x["fixed"], old_center, new)
            new_p = jnp.pad(
                new, [(0, 0)] * (new.ndim - 1) + [(2, 2)],
                constant_values=INF,
            )
            return new_p, new

        def one_block_parallel(m2, m1, x):
            """J parallel Jacobi iterations over the B block lines.

            Shapes: ``x`` entries carry a leading block dim B;
            ``cur``/bands get (B, ...line shape).  The per-line masks and
            material planes gain a broadcast axis against the source
            batch (lines are (n_src, S+4) under the batched final stage,
            (S+4,) under a single-source solve).
            """
            cur = x["old0"]  # (B, ..., S+4) current padded values
            # line batch dims between the block axis and the width axis
            # (1 under the batched stages: the source axis; 0 otherwise)
            extra = m1.ndim - 1
            i = x["idx"]

            def bexp(a):  # (B,) -> (B, 1, ..., 1) against line dims
                return a.reshape(a.shape + (1,) * m1.ndim)

            z_ok_b = {
                db: bexp((i + db >= 0) & (i + db <= Lt - 1))
                for db in (-2, -1, 0, 1, 2)
            }
            line0 = bexp(i == 0)
            lineN = bexp(i == Lt - 1)
            edges = dict(
                top=jnp.where(is_x, wfirst, line0),
                bottom=jnp.where(is_x, wlast, lineN),
                left=jnp.where(is_x, line0, wfirst),
                right=jnp.where(is_x, lineN, wlast),
            )
            # Materials: insert the broadcast axes so each plane matches
            # its per-line layout with a leading block axis.  fbs is
            # indexed positionally (fbs[0..3] in _fouds_candidate), so
            # its family axis must come FIRST: (B, 4, S) -> (4, B, 1*, S).
            mats_b = {}
            for k, v in x["mats"].items():
                if k == "fbs":
                    v = jnp.moveaxis(v, 1, 0)  # (4, B, S)
                    if extra:
                        v = jnp.expand_dims(v, tuple(range(2, 2 + extra)))
                elif extra:
                    # veln/velpn/vel_map: (B, S); stif: (B, S, 5) -- the
                    # broadcast axes go right after the block axis
                    v = jnp.expand_dims(v, tuple(range(1, 1 + extra)))
                mats_b[k] = v
            # scan-order-ahead old lines of the NEXT block (last entries
            # of this block's oldA/oldB shifted views)
            ahead_tail1 = x["oldA"][-1:]
            ahead_tail2 = x["oldB"][-2:]
            for _ in range(J):
                behind1 = jnp.concatenate([m1[None], cur[:-1]], axis=0)
                behind2 = jnp.concatenate(
                    [m2[None], m1[None], cur[:-2]], axis=0
                )
                ahead1 = jnp.concatenate([cur[1:], ahead_tail1], axis=0)
                ahead2 = jnp.concatenate([cur[2:], ahead_tail2], axis=0)
                band_fwd = jnp.stack(
                    [behind2, behind1, cur, ahead1, ahead2], -2
                )
                band_rev = jnp.stack(
                    [ahead2, ahead1, cur, behind1, behind2], -2
                )
                band = jnp.where(rev, band_rev, band_fwd)
                # Default FD-only update (inner_use_ali=False): monotone
                # upwind, so the parallel iteration cannot min-lock an
                # ALI-extrapolation undershoot (see local_update
                # docstring); the strict polish passes restore full ALI
                # values.  inner_use_ali=True keeps the full update --
                # used by the fixpoint-invariance tests; NOT min-lock
                # safe as a phase-1 envelope.
                new = _band_step_traced(
                    band, S, is_x, z_ok_b, edges, wok, mats_b, model,
                    model.dnx, use_ali=inner_use_ali,
                )
                old_center = cur[..., 2 : 2 + S]
                acc_min = jnp.minimum(old_center, new)
                acc_rep = jnp.where(new < INF * 0.5, new, old_center)
                new = jnp.where(replace, acc_rep, acc_min)
                new = jnp.where(x["fixed"], old_center, new)
                cur = jnp.pad(
                    new,
                    [(0, 0)] * (new.ndim - 1) + [(2, 2)],
                    constant_values=INF,
                )
            return (cur[-2], cur[-1]), cur[..., 2 : 2 + S]

        def step(carry, x):
            m2, m1 = carry
            if J > 0:
                return one_block_parallel(m2, m1, x)
            outs = []
            for b in range(B):
                xb = jax.tree.map(lambda a: a[b], x)
                new_p, new = one_line(m2, m1, xb)
                m2, m1 = m1, new_p
                outs.append(new)
            return (m2, m1), jnp.stack(outs, 0)

        (_, _), out = jax.lax.scan(step, (inf_line, inf_line), xs)
        out = out.reshape((Sp,) + out.shape[2:])[:S]
        out = jnp.where(rev, jnp.flip(out, axis=0), out)
        tt_new = jnp.where(
            is_x, jnp.moveaxis(out, 0, -1), jnp.moveaxis(out, 0, -2)
        )
        return tt_new, None

    tt_sq, _ = jax.lax.scan(dir_step, tt_sq, dirs)
    return tt_sq[..., :Z, :X]


def _band_step_traced(band, W, is_x, z_ok, edges, wok, center, model, dnx,
                      use_ali=True, use_fd=True):
    """_band_step with a *traced* axis flag: neighbour views select between
    the (dz, dx) and transposed (dx, dz) band offsets with jnp.where, so
    one instantiation serves both sweep axes."""
    tt_center = band[..., 2, 2 : 2 + W]
    nbr, known, inb = {}, {}, {}
    for (dz, dx) in OFFSETS:
        v_z = band[..., 2 + dz, 2 + dx : 2 + dx + W]
        v_x = band[..., 2 + dx, 2 + dz : 2 + dz + W]
        v = jnp.where(is_x, v_x, v_z)
        nbr[(dz, dx)] = v
        known[(dz, dx)] = (v < INF * 0.5) & (v < tt_center)
        inb[(dz, dx)] = jnp.where(
            is_x, z_ok[dx] & wok[dz], z_ok[dz] & wok[dx]
        )
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
        causal=True,
        use_ali=use_ali,
        use_fd=use_fd,
    )


def jacobi_pass(tt, model: gridlib.Model, fixed):
    """One whole-grid Jacobi pass with min accumulation (used by the
    halo-exchange sharded solver, where line scans don't cross shards)."""
    return jnp.minimum(tt, stencils.full_grid_update(tt, model, fixed,
                                                     causal=True))


def solve_fixpoint(
    tt0,
    model: gridlib.Model,
    fixed,
    rel_tol: float = 1e-6,
    max_passes: int = 50,
    min_passes: int = 2,
    polish_passes: int = 5,
    block: int = 1,
    inner: int = 0,
    max_polish_passes: int | None = None,
    use_ali: bool = True,
    phase1_use_ali: bool | None = None,
    polish_use_fd: bool = True,
):
    """Two-phase fixpoint solve (see module docstring).

    ``phase1_use_ali``: operator override for the phase-1 envelope only
    (None = same as ``use_ali``).  The production setting for concave
    shear modes is phase1_use_ali=False, use_ali=True: the monotone FD
    envelope can only OVERSHOOT the true first arrival (stencil
    quantisation), and the full-ALI replace polish then contracts onto
    the hull field FROM ABOVE -- the min-lock that traps an
    ALI-everywhere solve below the truth (FINDINGS_r4.md, 16-18% early)
    needs an undershooting envelope to latch onto.  When the operators
    differ the two phases run as separate loops (two compiled bodies)
    with the polish residual-driven under ``max_polish_passes``.

    Runs under jit; with ``inner == 0`` both phases share one
    lax.while_loop (and thus one compiled sweep body per axis).  With
    ``inner > 0`` the phase-1 envelope runs parallel-in-block sweeps in
    its own while_loop and the replace-mode polish runs STRICTLY ordered
    in a second loop (see the gs_pass caveat: all-parallel polish settles
    at a different self-consistent field; ordered polish restores the
    validated heap-march values).  Returns (field, SolveInfo).

    ``max_polish_passes``: None (default) keeps the legacy fixed-count
    polish (exactly ``polish_passes`` replace rounds).  Set it > then
    ``polish_passes`` for a residual-driven polish: at least
    ``polish_passes`` rounds, continuing until the pass-to-pass delta
    drops below ``rel_tol`` or the cap -- measured deficit of the fixed
    count: ~5e-8 absolute in far grid corners after 8 rounds on a 32x40
    seeded solve (the correction wave arrives there last), which the
    accuracy preset and the halo-sharded comparison tests care about.
    """
    max_passes = jnp.asarray(max_passes)
    mp2 = polish_passes if max_polish_passes is None else max_polish_passes
    p1_ali = use_ali if phase1_use_ali is None else phase1_use_ali

    # ``polish_use_fd=False``: replace-polish passes skip the FD fallback
    # (see stencils.local_update use_fd) -- a perf mode for production
    # solves where phase 1 has already established every FD-determined
    # value; needs the two-loop form (its polish body differs from the
    # phase-1 body).
    if inner or p1_ali != use_ali or not polish_use_fd:
        def cond1(state):
            tt, prev, k, n1, conv = state
            return k < max_passes

        def body1(state):
            tt, prev, k, n1, conv = state
            new = gs_pass(tt, model, fixed, replace=False, block=block,
                          inner=inner, use_ali=p1_ali)
            known = new < INF * 0.5
            delta = jnp.max(
                jnp.where(known | (tt < INF * 0.5), jnp.abs(new - tt), 0.0)
            )
            scale = jnp.max(jnp.where(known, new, 0.0))
            converged = delta <= rel_tol * jnp.maximum(scale, 1e-30)
            stop = converged & (n1 + 1 >= min_passes)
            # k is loop control (jumps to the cap on early stop); n1 keeps
            # the REAL pass count for the SolveInfo record.
            k1 = jnp.where(stop, max_passes, k + 1)
            return (new, tt, k1, n1 + 1, conv | stop)

        tt, _, _, n1, conv = jax.lax.while_loop(
            cond1, body1, (tt0, tt0 + 1.0, jnp.asarray(0), jnp.asarray(0),
                           jnp.asarray(False))
        )

        def cond2(state):
            tt, prev, k = state
            return k < mp2

        def body2(state):
            # residual-driven replace polish (>= polish_passes rounds,
            # <= mp2); with max_polish_passes=None this is exactly the
            # legacy fixed count
            tt, prev, k = state
            new = gs_pass(tt, model, fixed, replace=True, block=block,
                          inner=0, use_ali=use_ali, use_fd=polish_use_fd)
            known = new < INF * 0.5
            delta = jnp.max(
                jnp.where(known | (tt < INF * 0.5), jnp.abs(new - tt), 0.0)
            )
            scale = jnp.max(jnp.where(known, new, 0.0))
            converged = delta <= rel_tol * jnp.maximum(scale, 1e-30)
            k1 = jnp.where(converged & (k + 1 >= polish_passes), mp2, k + 1)
            return (new, tt, k1)

        tt, _, _ = jax.lax.while_loop(
            cond2, body2, (tt, tt + 1.0, jnp.asarray(0))
        )
        return tt, SolveInfo(passes=n1, converged=conv)

    def cond(state):
        tt, prev, k, phase, n1, conv = state
        return ~((phase >= 1) & (k >= mp2))

    def body(state):
        tt, prev, k, phase, n1, conv = state
        new = gs_pass(tt, model, fixed, replace=(phase == 1), block=block,
                      use_ali=use_ali)
        known = new < INF * 0.5
        delta = jnp.max(
            jnp.where(known | (tt < INF * 0.5), jnp.abs(new - tt), 0.0)
        )
        scale = jnp.max(jnp.where(known, new, 0.0))
        converged = delta <= rel_tol * jnp.maximum(scale, 1e-30)
        k1 = k + 1
        done1 = (phase == 0) & ((k1 >= max_passes) | (converged & (k1 >= min_passes)))
        done2 = (phase == 1) & ((k1 >= mp2) | (converged & (k1 >= polish_passes)))
        new_phase = jnp.where(done1, 1, phase)
        new_k = jnp.where(done1, 0, jnp.where(done2, mp2, k1))
        n1 = jnp.where(done1, k1, n1)
        conv = jnp.where(done1, converged, conv)
        return (new, tt, new_k, new_phase, n1, conv)

    init = (tt0, tt0 + 1.0, jnp.asarray(0), jnp.asarray(0), jnp.asarray(0),
            jnp.asarray(False))
    tt, _, _, _, n1, conv = jax.lax.while_loop(cond, body, init)
    return tt, SolveInfo(passes=n1, converged=conv)
