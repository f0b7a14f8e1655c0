"""Multi-chip scale-out: source-axis sharding and grid sharding with halo
exchange.

The reference parallelises with a multiprocessing pool over sources
(Anis_TTF_rays.py:3938-4051, :4550-4685) and has no multi-node story; the
TPU-native equivalents are

* ``solve_ttf_sharded``   -- shard the *source batch* across a device mesh
  (each device runs the full telescoped solve for its sources; no
  communication beyond the final gather).  This is the production layout
  for transducer arrays: embarrassingly parallel, rides the vmap.
* ``trace_rays_sharded``  -- same for the ray batch (receiver fields are
  replicated; ray pairs are split across devices).
* ``solve_halo_sharded``  -- for grids too large for one chip: the grid is
  split along z across the mesh, every device runs line sweeps on its slab,
  and 2-cell halos are exchanged each pass over ICI (jax.lax.ppermute under
  shard_map).  Line sweeps inside a slab + halo iteration between slabs is
  the standard domain-decomposed fast-sweeping layout.

All entry points take an explicit ``jax.sharding.Mesh``; on one chip they
degrade to the unsharded paths.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import grid as gridlib
from .. import rays as rayslib
from .. import solver as solverlib
from ..ops import sweep
from ..ops.stencils import INF

__all__ = [
    "solve_ttf_sharded",
    "trace_rays_sharded",
    "solve_halo_sharded",
    "solve_ttf_halo",
    "pad_sources",
]


def pad_sources(scx, scz, n_devices):
    """Pad a source batch to a multiple of the device count (padded entries
    duplicate source 0 and are dropped by the caller)."""
    n = len(scx)
    m = (-n) % n_devices
    if m:
        scx = np.concatenate([scx, np.repeat(scx[:1], m)])
        scz = np.concatenate([scz, np.repeat(scz[:1], m)])
    return scx, scz, n


def solve_ttf_sharded(
    model: gridlib.Model,
    scx,
    scz,
    mesh: Mesh,
    axis: str = "src",
    subgrid_size: int = 1,
    cfg: solverlib.SolveConfig = solverlib.SolveConfig(),
    stages=None,
    seed_side=None,
):
    """Travel-time fields with the source batch sharded over ``mesh``.

    The model is replicated; each device solves its slice of the sources
    with the identical telescoped pipeline.  Output is sharded along the
    source axis (gather happens lazily if the caller pulls it to host).
    """
    scx, scz, n_real = pad_sources(np.asarray(scx), np.asarray(scz),
                                   mesh.devices.size)
    if subgrid_size == 1:
        base = model
        if stages is None:
            stages = solverlib.coarse_stages(cfg)
            seed_side = solverlib._COARSE_SEED_SIDE
        seed_sign = solverlib._COARSE_SEED_SIGN
    else:
        base = gridlib.refine_model(model, subgrid_size,
                                    dtype=model.vel_map.dtype)
        if stages is None:
            stages, seed_side = solverlib.fine_stage_params(subgrid_size)
        seed_sign = +1.0

    src_sharding = NamedSharding(mesh, P(axis))
    scx_d = jax.device_put(jnp.asarray(scx), src_sharding)
    scz_d = jax.device_put(jnp.asarray(scz), src_sharding)
    # The stage-jitted pipeline propagates the source-axis sharding through
    # every stage (GSPMD); the model stays replicated.
    out = solverlib._staged_solve(
        base, scx_d, scz_d, stages, seed_side, seed_sign, cfg
    )
    return out[:n_real]


def trace_rays_sharded(
    model: gridlib.Model,
    rec_ttf,
    ttf_index,
    source_xy,
    receiver_xy,
    subgrid_size: int,
    mesh: Mesh,
    axis: str = "src",
    mode: str = "interp",
    **kw,
):
    """Ray batch sharded over ``mesh`` (fields replicated).

    Runs as an explicit ``shard_map`` (not GSPMD propagation): each
    device traces its ray slice against the replicated fields with ZERO
    cross-device collectives in the program.  The earlier GSPMD layout
    let the partitioner insert an (all-reduce, all-gather) pair that the
    CPU thunk executor could schedule in different orders on different
    device threads -- a genuine distributed deadlock, reproduced
    deterministically on the 8-thread virtual mesh (round-4 dryrun
    rendezvous timeouts at 120 s+).  A collective-free program cannot
    deadlock and is also the faster layout on real ICI (no traffic).
    """
    n = source_xy.shape[0]
    nd = mesh.shape[axis]
    m = (-n) % nd
    if m:
        source_xy = jnp.concatenate([source_xy, source_xy[:1].repeat(m, 0)])
        receiver_xy = jnp.concatenate(
            [receiver_xy, receiver_xy[:1].repeat(m, 0)]
        )
        ttf_index = jnp.concatenate([ttf_index, ttf_index[:1].repeat(m, 0)])
    source_xy = jax.device_put(source_xy, NamedSharding(mesh, P(axis, None)))
    receiver_xy = jax.device_put(receiver_xy,
                                 NamedSharding(mesh, P(axis, None)))
    ttf_index = jax.device_put(ttf_index, NamedSharding(mesh, P(axis)))
    rec_ttf = jax.device_put(rec_ttf, NamedSharding(mesh, P()))

    fn = _trace_sharded_fn(mesh, axis, int(subgrid_size), mode,
                           tuple(sorted(kw.items())))
    rx, ry, lens, times = fn(
        model, rec_ttf, ttf_index, source_xy, receiver_xy
    )
    return rx[:n], ry[:n], lens[:n], times[:n]


_TRACE_SHARDED_CACHE: dict = {}


def _trace_sharded_fn(mesh, axis, subgrid_size, mode, kw_items):
    """Jitted shard_map for trace_rays_sharded, cached per
    (mesh, axis, subgrid, mode, static kw) so repeated FMC-style ray
    batches reuse ONE compiled executable instead of retracing a fresh
    closure every call (ADVICE round 4).  The model rides in as a
    replicated (P()) argument, keeping the program collective-free."""
    key = (mesh, axis, subgrid_size, mode, kw_items)
    fn = _TRACE_SHARDED_CACHE.get(key)
    if fn is None:
        kw = dict(kw_items)

        def local(mdl, ttf, tidx, sxy, rxy):
            return rayslib.trace_rays(mdl, ttf, tidx, sxy, rxy,
                                      subgrid_size, mode=mode, **kw)

        fn = jax.jit(jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis, None), P(axis, None)),
            out_specs=(P(axis, None), P(axis, None), P(axis), P(axis)),
            check_vma=False,
        ))
        _TRACE_SHARDED_CACHE[key] = fn
    return fn


def solve_ttf_halo(
    model: gridlib.Model,
    scx,
    scz,
    mesh: Mesh,
    axis: str = "gz",
    subgrid_size: int = 1,
    cfg: solverlib.SolveConfig = solverlib.SolveConfig(),
    n_inner: int = 1,
    return_info: bool = False,
    stages=None,
    seed_side=None,
):
    """Telescoped travel-time solve with the GRID sharded across ``mesh``.

    The production large-grid path: per-source telescoping patch stages
    (27x/9x/3x) run replicated -- they are tiny (109x109) -- and their
    stride-3 injection seeds the final full-grid stage, which runs as the
    residual-driven halo-exchange solve (solve_halo_sharded) on the
    z-decomposed grid.  This gives the sharded path the same near-source
    accuracy as the single-chip solver (the raw-sweep-only limitation of
    round 2 is gone).

    ``scx``/``scz``: 1D source-coordinate batch (replicated).  Grids whose
    Z is not a multiple of the mesh size are edge-padded with fixed INF
    rows and cropped on return.  Returns (n_src, Z, X) fields [+ SolveInfo
    with ``return_info=True``].
    """
    if subgrid_size == 1:
        base = model
        if stages is None:
            stages = solverlib.coarse_stages(cfg)
            seed_side = solverlib._COARSE_SEED_SIDE
        seed_sign = solverlib._COARSE_SEED_SIGN
    else:
        base = gridlib.refine_model(model, subgrid_size,
                                    dtype=model.vel_map.dtype)
        if stages is None:
            stages, seed_side = solverlib.fine_stage_params(subgrid_size)
        seed_sign = +1.0
    scx = jnp.asarray(scx)
    scz = jnp.asarray(scz)
    Z, X = base.shape
    dtype = base.vel_map.dtype

    # replicated telescoping patch stages (solver stage pipeline)
    (h0, f0) = stages[0]
    tt, bz, bx = solverlib._stage_first(
        base, scx, scz, h0, f0, seed_side, float(seed_sign), cfg
    )
    for (h, f) in stages[1:]:
        tt, bz, bx = solverlib._stage_next(base, scx, scz, tt, bz, bx, h, f,
                                           cfg)

    @jax.jit
    def inject(tt, bz, bx):
        def one(ptt, pbz, pbx):
            return solverlib._inject(
                ptt, (pbz, pbx), 3, (Z, X), (0, 0), 1, dtype, (Z, X)
            )

        return jax.vmap(one)(tt, bz, bx)

    tt0, fixed = inject(tt, bz, bx)

    # pad Z (and X for a 2D axis tuple) to slab multiples: INF cells
    # marked fixed, edge materials.  Slab counts = the HALO AXIS extents
    # (not the total device count): under a hybrid (src, gz) mesh only
    # the gz axis decomposes the grid.
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    n_sz = mesh.shape[axes[0]]
    n_sx = mesh.shape[axes[1]] if len(axes) == 2 else 1
    pad_rows = (-Z) % n_sz
    pad_cols = (-X) % n_sx
    mdl = base
    if pad_rows or pad_cols:
        def padp(a, mode="edge", lead=0):
            cfg_p = ([(0, 0)] * lead + [(0, pad_rows), (0, pad_cols)]
                     + [(0, 0)] * (a.ndim - lead - 2))
            return jnp.pad(a, cfg_p, mode=mode)

        mdl = gridlib.Model(
            veln=padp(base.veln),
            velpn=padp(base.velpn),
            vel_map=padp(base.vel_map),
            stif=padp(base.stif),
            group_tab=base.group_tab,
            phase_tab=base.phase_tab,
            fallback_slowness=padp(base.fallback_slowness, lead=1),
            dnx=base.dnx,
            ray_curves=None,
            ray_curve_idx=None,
            ray_skew=None,
            has_stif=base.has_stif,
            phase_info=base.phase_info,
            group_info=base.group_info,
            ray_info=None,
        )
        tt0 = jnp.pad(tt0, ((0, 0), (0, pad_rows), (0, pad_cols)),
                      constant_values=INF)
        fixed = jnp.pad(fixed, ((0, 0), (0, pad_rows), (0, pad_cols)),
                        constant_values=True)

    f_tol = cfg.rel_tol if cfg.final_rel_tol is None else cfg.final_rel_tol
    f_pol = (cfg.polish_passes if cfg.final_polish_passes is None
             else cfg.final_polish_passes)
    max_pol = (cfg.final_max_polish if cfg.final_max_polish is not None
               else max(cfg.final_max_passes, 4 * f_pol))
    # info outputs only when asked: unconsumed epilogue collectives from
    # the info gather can overlap the caller's next dispatch and
    # distributed-deadlock the virtual CPU mesh (round-4 dryrun)
    out = solve_halo_sharded(
        tt0, mdl, fixed, mesh, axis=axis, n_inner=n_inner, polish=f_pol,
        rel_tol=f_tol, max_outer=cfg.final_max_passes,
        max_polish=max_pol,
        return_info=return_info, z_true=Z if pad_rows else None,
        x_true=X if pad_cols else None,
    )
    if return_info:
        out, info = out
        return out[..., :Z, :X], info
    return out[..., :Z, :X]


def _halo_jacobi_block(tt, model_blk: gridlib.Model, fixed, n_inner, axis,
                       z_total, replace=False, z_true=None):
    """``n_inner`` full Gauss-Seidel passes on the z-decomposed grid,
    BIT-IDENTICAL to the single-device ``sweep.gs_pass`` order.

    The z-direction sweeps are *pipelined* across slabs (the classic
    domain-decomposed fast-sweeping wavefront ordering): a z-forward
    sweep runs ``n_slab`` sub-steps, only slab ``s`` commits its sweep at
    sub-step ``s``, and a 2-row halo exchange after each sub-step hands
    slab ``s``'s freshly-updated last rows to slab ``s+1`` before its
    turn -- exactly the carry the single-device scan would have.  The
    x-direction sweeps need no pipelining: a column's in-column z
    neighbours use *pre-sweep* values even on one device (the band's
    centre line), which is precisely what the halo rows hold after the
    previous directional sweep's exchange.

    Why not plain per-slab sweeps with halo exchange between passes
    (round 2's scheme): the replace-phase update's stencil *selection*
    (min-difference, not min-time -- Anis_TTF_rays.py:994-1033) is
    sensitive to whether an upwind neighbour has already been updated
    this sweep.  Jacobi-stale slab boundaries flip those selections and
    the iteration settles on a *different self-consistent field*: a
    telescoped source on a slab's last row measured 24% off at two cells
    (the decomposed polish derived the first row below the boundary from
    a stale wavefront; bench_data/diag_halo_r3*.py).  Pipelining makes
    every sweep reproduce the single-device op order exactly, so
    sharded == single-device holds to fp identity for any seed.

    Cost: the z-sweeps serialize across slabs (inherent to GS causality
    -- the wavefront must cross the boundary), so a full pass costs
    ~(1 + 1/n_slab)/2 of a single-device pass in wall-clock while the
    x-sweeps and all bandwidth still scale with the mesh.  Decomposing x
    as well (2D mesh) would recover z-sweep parallelism; noted as future
    work in PARITY.md.

    ``z_total``: padded global Z (slab layout); ``z_true``: the real grid's
    Z for boundary/in-bounds semantics when rows were padded to a slab
    multiple (padded rows are fixed INF and masked out-of-bounds so edge
    stencils at the true bottom row behave exactly like the unsharded
    solve).
    """
    z_true = z_total if z_true is None else z_true
    n_slab = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)

    def exchange(t):
        up = jax.lax.ppermute(
            t[..., -4:-2, :], axis,
            [(i, i + 1) for i in range(n_slab - 1)],
        )
        down = jax.lax.ppermute(
            t[..., 2:4, :], axis,
            [(i + 1, i) for i in range(n_slab - 1)],
        )
        first = my == 0
        last = my == n_slab - 1
        t = t.at[..., 0:2, :].set(
            jnp.where(first, jnp.full_like(up, INF), up)
        )
        t = t.at[..., -2:, :].set(
            jnp.where(last, jnp.full_like(down, INF), down)
        )
        return t

    tt = exchange(tt)
    rep = jnp.asarray(replace)
    f_ = jnp.asarray(False)
    t_ = jnp.asarray(True)
    # Global grid coordinates of this (2-row-padded) slab, so boundary and
    # in-bounds stencil semantics match the unsharded grid exactly.
    goff = my * (z_total // n_slab) - 2
    zkw = dict(scan_off=goff, scan_total=z_true)
    xkw = dict(width_off=goff, width_total=z_true)

    def z_sweep(t, rev):
        def step(s, t):
            active = jnp.where(rev, my == n_slab - 1 - s, my == s)
            new = sweep._sweep_axis(t, model_blk, fixed, "z", rev, rep,
                                    **zkw)
            t = jnp.where(active, new, t)
            return exchange(t)

        return jax.lax.fori_loop(0, n_slab, step, t)

    for _ in range(n_inner):
        tt = z_sweep(tt, f_)
        tt = z_sweep(tt, t_)
        # x-sweeps: carry columns cross the slab boundary, so each line's
        # fresh boundary rows are ppermuted into the carry (halo_axis) --
        # see _sweep_axis; with that, both x directions are GS-exact too.
        tt = exchange(
            sweep._sweep_axis(tt, model_blk, fixed, "x", f_, rep,
                              halo_axis=axis, **xkw)
        )
        tt = exchange(
            sweep._sweep_axis(tt, model_blk, fixed, "x", t_, rep,
                              halo_axis=axis, **xkw)
        )
    return tt


def _halo_block2d(tt, model_blk: gridlib.Model, fixed, n_inner, axis_z,
                  axis_x, z_total, x_total, replace=False, z_true=None,
                  x_true=None):
    """``n_inner`` full GS passes on a 2D (z, x)-decomposed grid,
    BIT-IDENTICAL to the single-device ``sweep.gs_pass`` order.

    The 2D generalisation of _halo_jacobi_block: each directional sweep
    is *pipelined* across the mesh axis it scans (gz for z-sweeps, gx
    for x-sweeps) and runs *parallel* across the other axis, with the
    in-sweep carry refreshed across that other axis per line
    (sweep._sweep_axis ``halo_axis``).  This recovers the throughput the
    1D decomposition gives up: on an (n_sz, n_sx) mesh a full 4-sweep
    pass costs ~2/n_sx + 2/n_sz of a single-device pass (vs (1+1/n)/2
    for the 1D slab layout whose z-sweeps serialize at full width),
    while memory still scales with the full device count.

    Local arrays carry 2-cell halos on BOTH grid axes: (..., Zs+4,
    Xs+4).  Halo cells are marked fixed (updates discarded); their
    values refresh by row/column ppermutes -- full-extent transfers so
    corner cells propagate through the second exchange.  Pre-sweep
    neighbour reads (the band's old lines) see the last exchange;
    same-sweep carry reads are spliced per line by refresh_carry, so
    every update consumes exactly the values the single-device scan
    would have (see the 1D docstring for why GS-exactness matters:
    Jacobi-stale boundaries flip ALI stencil *selection*).
    """
    z_true = z_total if z_true is None else z_true
    x_true = x_total if x_true is None else x_true
    n_sz = jax.lax.axis_size(axis_z)
    n_sx = jax.lax.axis_size(axis_x)
    my_z = jax.lax.axis_index(axis_z)
    my_x = jax.lax.axis_index(axis_x)

    def exchange_z(t):
        up = jax.lax.ppermute(
            t[..., -4:-2, :], axis_z,
            [(i, i + 1) for i in range(n_sz - 1)],
        )
        down = jax.lax.ppermute(
            t[..., 2:4, :], axis_z,
            [(i + 1, i) for i in range(n_sz - 1)],
        )
        t = t.at[..., 0:2, :].set(
            jnp.where(my_z == 0, jnp.full_like(up, INF), up)
        )
        t = t.at[..., -2:, :].set(
            jnp.where(my_z == n_sz - 1, jnp.full_like(down, INF), down)
        )
        return t

    def exchange_x(t):
        left = jax.lax.ppermute(
            t[..., :, -4:-2], axis_x,
            [(i, i + 1) for i in range(n_sx - 1)],
        )
        right = jax.lax.ppermute(
            t[..., :, 2:4], axis_x,
            [(i + 1, i) for i in range(n_sx - 1)],
        )
        t = t.at[..., :, 0:2].set(
            jnp.where(my_x == 0, jnp.full_like(left, INF), left)
        )
        t = t.at[..., :, -2:].set(
            jnp.where(my_x == n_sx - 1, jnp.full_like(right, INF), right)
        )
        return t

    goff_z = my_z * (z_total // n_sz) - 2
    goff_x = my_x * (x_total // n_sx) - 2
    rep = jnp.asarray(replace)
    f_ = jnp.asarray(False)
    t_ = jnp.asarray(True)
    zkw = dict(scan_off=goff_z, scan_total=z_true,
               width_off=goff_x, width_total=x_true)
    xkw = dict(scan_off=goff_x, scan_total=x_true,
               width_off=goff_z, width_total=z_true)

    def z_sweep(t, rev):
        # both halo rings pre-sweep fresh: rows (scan carry init + ahead
        # lines) and columns (width neighbours); row exchange second so
        # the transferred rows carry fresh corner columns
        t = exchange_z(exchange_x(t))

        def step(s, t):
            active = jnp.where(rev, my_z == n_sz - 1 - s, my_z == s)
            new = sweep._sweep_axis(t, model_blk, fixed, "z", rev, rep,
                                    halo_axis=axis_x, **zkw)
            t = jnp.where(active, new, t)
            return exchange_z(t)

        return jax.lax.fori_loop(0, n_sz, step, t)

    def x_sweep(t, rev):
        t = exchange_x(exchange_z(t))

        def step(s, t):
            active = jnp.where(rev, my_x == n_sx - 1 - s, my_x == s)
            new = sweep._sweep_axis(t, model_blk, fixed, "x", rev, rep,
                                    halo_axis=axis_z, **xkw)
            t = jnp.where(active, new, t)
            return exchange_x(t)

        return jax.lax.fori_loop(0, n_sx, step, t)

    for _ in range(n_inner):
        tt = z_sweep(tt, f_)
        tt = z_sweep(tt, t_)
        tt = x_sweep(tt, f_)
        tt = x_sweep(tt, t_)
    return tt


def solve_halo_sharded(
    tt0,
    model: gridlib.Model,
    fixed,
    mesh: Mesh,
    axis: str = "gz",
    n_outer: int = 8,
    n_inner: int = 2,
    polish: int = 2,
    rel_tol: float | None = None,
    max_outer: int = 64,
    max_polish: int = 16,
    return_info: bool = False,
    z_true: int | None = None,
    x_true: int | None = None,
):
    """Fixpoint solve on a z-sharded grid with 2-cell halo exchange.

    ``tt0``/``fixed`` are (Z, X) -- or batched (B, Z, X) with the batch
    replicated -- with Z divisible by the mesh size; the model's planes
    are sharded the same way.  Intended for grids larger than one chip's
    memory (SURVEY.md section 5: grid-size is the scale axis).

    Stopping rule:

    * ``rel_tol=None`` (legacy): a fixed budget of ``n_outer`` min-phase
      rounds plus ``polish`` replace-phase rounds.  The z-sweeps are
      pipelined across slabs (see _halo_jacobi_block), so one round
      propagates information exactly as far as one single-device
      gs_pass: size ``n_outer``/``polish`` like solve_fixpoint's
      ``max_passes``/``polish_passes`` -- no n_slabs scaling needed.
      With matching budgets the result is bit-identical to the
      single-device solve (tests/test_shard.py pins rtol 1e-12).
    * ``rel_tol=r`` (production): residual-driven two-phase while_loop --
      min-phase rounds until the global (pmax over shards) pass-to-pass
      delta drops below ``r * max(tt)`` or ``max_outer`` rounds, then
      replace-phase polish rounds under the same test bounded by
      ``max_polish`` (at least ``polish`` rounds).  Running the replace
      phase to ITS OWN fixpoint (not a fixed count) is what pins the
      decomposed solve onto the same field as the single-device sweeps:
      transient-history tie-flips then have the full contraction to wash
      out (see tests/test_shard.py envelopes).

    ``return_info=True`` appends a sweep.SolveInfo(outer passes,
    converged) diagnostic.

    2D decomposition: pass ``axis=("gz", "gx")`` to split BOTH grid axes
    across the mesh (Z divisible by mesh.shape["gz"], X by
    mesh.shape["gx"]).  Same fp-identical semantics via _halo_block2d;
    the 2D layout additionally parallelises each directional sweep
    across the non-scanned mesh axis, so throughput scales instead of
    just memory (see _halo_block2d's cost note).  ``x_true`` mirrors
    ``z_true`` for column padding.
    """
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    two_d = len(axes) == 2
    az = axes[0]
    ax = axes[1] if two_d else None
    n_sz = mesh.shape[az]  # slabs = halo-axis extent, not total devices
    n_sx = mesh.shape[ax] if two_d else 1
    Z = tt0.shape[-2]
    X = tt0.shape[-1]
    assert Z % n_sz == 0, (Z, n_sz)
    assert X % n_sx == 0, (X, n_sx)
    batched = tt0.ndim == 3

    xs = ax  # None -> unsharded x in the specs below
    spec_grid = P(az, xs) if not batched else P(None, az, xs)
    spec_plane = P(az, xs)
    spec_stif = P(az, xs, None)
    spec_fb = P(None, az, xs)

    def padz(t, val):
        w = (2, 2) if two_d else (0, 0)
        cfg = [(0, 0)] * (t.ndim - 2) + [(2, 2), w]
        return jnp.pad(t, cfg, constant_values=val)

    def local(tt, fixed, veln, velpn, vel_map, stif, fbs, dnx, gtab, ptab):
        # slab model with 2-cell halos (both grid axes when 2D)
        w = (2, 2) if two_d else (0, 0)

        def padm(a, val=0.0):
            cfg = [(2, 2), w] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, cfg, constant_values=val)

        blk = gridlib.Model(
            veln=padm(veln),
            velpn=padm(velpn, 1),
            vel_map=padm(vel_map, 1.0),
            stif=padm(stif, 1),
            group_tab=gtab,
            phase_tab=ptab,
            fallback_slowness=jnp.pad(
                fbs, ((0, 0), (2, 2), w), constant_values=1.0
            ),
            dnx=dnx,
            ray_curves=None,
            ray_curve_idx=None,
            ray_skew=None,
            has_stif=model.has_stif,
            phase_info=model.phase_info,
            group_info=model.group_info,
            ray_info=None,
        )
        t = padz(tt, INF)
        f = padz(fixed, True)

        def interior(a):
            return a[..., 2:-2, 2:-2] if two_d else a[..., 2:-2, :]

        def block(t, replace):
            if two_d:
                return _halo_block2d(
                    t, blk, f, n_inner, az, ax, Z, X, replace=replace,
                    z_true=z_true, x_true=x_true,
                )
            return _halo_jacobi_block(
                t, blk, f, n_inner, az, Z, replace=replace, z_true=z_true,
            )

        def round_delta(new, old):
            interior_new = interior(new)
            interior_old = interior(old)
            known = interior_new < INF * 0.5
            d = jnp.max(
                jnp.where(
                    known | (interior_old < INF * 0.5),
                    jnp.abs(interior_new - interior_old),
                    0.0,
                )
            )
            s = jnp.max(jnp.where(known, interior_new, 0.0))
            # global agreement across slabs: every device sees the same
            # (delta, scale), so the while_loop predicates stay uniform.
            # ONE joint-axes collective for BOTH scalars: independent
            # collectives can be scheduled in different orders by
            # different devices' thunk executors, which distributed-
            # deadlocks the virtual CPU mesh (round-4 dryrun rendezvous
            # timeouts); a single fused all-reduce keeps the collective
            # schedule totally ordered.
            axes = (az, ax) if two_d else az
            ds = jax.lax.pmax(jnp.stack([d, s]), axes)
            return ds[0], ds[1]

        # halo rows are marked fixed so local sweeps treat them as boundary
        # data; their values refresh from the neighbour slab each exchange.
        if rel_tol is None:
            # Legacy fixed budget: one compiled sweep body via fori;
            # rounds >= n_outer switch to the replace-polish phase.  The
            # carry keeps the previous round's field so ``converged`` can
            # report the REAL final-round residual (vs solve_fixpoint's
            # default 1e-6 relative tolerance) instead of an unconditional
            # True (round-3 advisor finding).
            def step(k, state):
                t, _ = state
                new = block(t, replace=(k >= n_outer))
                return (new, t)

            t, t_prev = jax.lax.fori_loop(
                0, n_outer + polish, step, (t, t)
            )
            # plain tuple (not SolveInfo): out_specs matching is by pytree
            # structure, rebuilt into SolveInfo outside the shard_map
            if return_info:
                d, s = round_delta(t, t_prev)
                conv = d <= 1e-6 * jnp.maximum(s, 1e-30)
                return interior(t), (jnp.asarray(n_outer), conv)
            return interior(t)

        def cond(state):
            t, k, phase, n1, conv = state
            return ~((phase >= 1) & (k >= max_polish))

        def body(state):
            t, k, phase, n1, conv = state
            new = block(t, replace=(phase == 1))
            d, s = round_delta(new, t)
            converged = d <= rel_tol * jnp.maximum(s, 1e-30)
            k1 = k + 1
            # per-phase (cap, min-rounds): min phase runs >= 2 rounds up to
            # max_outer; replace polish runs >= max(polish, 1) rounds up to
            # max_polish -- each exits early once converged.
            cap = jnp.where(phase == 0, max_outer, max_polish)
            minp = jnp.where(phase == 0, 2, jnp.maximum(polish, 1))
            done = (k1 >= cap) | (converged & (k1 >= minp))
            adv = (phase == 0) & done
            n1 = jnp.where(adv, k1, n1)
            conv = jnp.where(adv, converged, conv)
            new_phase = jnp.where(adv, 1, phase)
            # on phase-2 done: force k to the cond bound to exit
            k_next = jnp.where(
                adv, 0, jnp.where(done & (phase == 1), max_polish, k1)
            )
            return (new, k_next, new_phase, n1, conv)

        state = (
            t, jnp.asarray(0), jnp.asarray(0), jnp.asarray(0),
            jnp.asarray(False),
        )
        t, _, _, n1, conv = jax.lax.while_loop(cond, body, state)
        if return_info:
            return interior(t), (n1, conv)
        return interior(t)

    out_specs = (
        (spec_grid, (P(), P())) if return_info else spec_grid
    )
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            spec_grid, spec_grid, spec_plane, spec_plane, spec_plane,
            spec_stif, spec_fb, P(), P(None, None), P(None, None),
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    out = jax.jit(fn)(
        tt0, fixed, model.veln, model.velpn, model.vel_map, model.stif,
        model.fallback_slowness, model.dnx, model.group_tab, model.phase_tab,
    )
    if return_info:
        field, (n1, conv) = out
        return field, sweep.SolveInfo(passes=n1, converged=conv)
    return out
