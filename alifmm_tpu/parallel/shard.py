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
            stages = solverlib._COARSE_STAGES
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
    """Ray batch sharded over ``mesh`` (fields replicated)."""
    n = source_xy.shape[0]
    m = (-n) % mesh.devices.size
    if m:
        source_xy = jnp.concatenate([source_xy, source_xy[:1].repeat(m, 0)])
        receiver_xy = jnp.concatenate(
            [receiver_xy, receiver_xy[:1].repeat(m, 0)]
        )
        ttf_index = jnp.concatenate([ttf_index, ttf_index[:1].repeat(m, 0)])
    ray_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    source_xy = jax.device_put(source_xy, NamedSharding(mesh, P(axis, None)))
    receiver_xy = jax.device_put(receiver_xy, NamedSharding(mesh, P(axis, None)))
    ttf_index = jax.device_put(ttf_index, ray_sharding)
    rec_ttf = jax.device_put(rec_ttf, rep)
    rx, ry, lens, times = rayslib.trace_rays(
        model, rec_ttf, ttf_index, source_xy, receiver_xy, subgrid_size,
        mode=mode, **kw,
    )
    return rx[:n], ry[:n], lens[:n], times[:n]


def _halo_jacobi_block(tt, model_blk: gridlib.Model, fixed, n_inner, axis,
                       z_total, replace=False):
    """n_inner line-sweep passes on a slab, then a 2-row halo exchange."""

    def exchange(t):
        up = jax.lax.ppermute(
            t[..., -4:-2, :], axis,
            [(i, i + 1) for i in range(jax.lax.axis_size(axis) - 1)],
        )
        down = jax.lax.ppermute(
            t[..., 2:4, :], axis,
            [(i + 1, i) for i in range(jax.lax.axis_size(axis) - 1)],
        )
        idx = jax.lax.axis_index(axis)
        first = idx == 0
        last = idx == jax.lax.axis_size(axis) - 1
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
    goff = jax.lax.axis_index(axis) * (z_total // jax.lax.axis_size(axis)) - 2
    zkw = dict(scan_off=goff, scan_total=z_total)
    xkw = dict(width_off=goff, width_total=z_total)
    for _ in range(n_inner):
        # exchange after every directional sweep so information crosses one
        # slab per sweep rather than one per pass
        tt = exchange(
            sweep._sweep_axis(tt, model_blk, fixed, "z", f_, rep, **zkw)
        )
        tt = exchange(
            sweep._sweep_axis(tt, model_blk, fixed, "z", t_, rep, **zkw)
        )
        tt = exchange(
            sweep._sweep_axis(tt, model_blk, fixed, "x", f_, rep, **xkw)
        )
        tt = exchange(
            sweep._sweep_axis(tt, model_blk, fixed, "x", t_, rep, **xkw)
        )
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
):
    """Fixpoint solve on a z-sharded grid with 2-cell halo exchange.

    ``tt0``/``fixed`` are (Z, X) with Z divisible by the mesh size; the
    model's planes are sharded the same way.  Each outer round runs
    ``n_inner`` local Gauss-Seidel passes per slab and exchanges halos over
    ICI; ``polish`` replace-phase rounds follow.  Intended for grids larger
    than one chip's memory (SURVEY.md section 5: grid-size is the scale
    axis).

    Sizing ``n_outer``: halos are exchanged after every directional sweep,
    so causal information crosses at most one slab boundary per exchange
    (4 per inner round).  Budget ``n_outer * n_inner >= n_slabs + margin``
    where the margin covers characteristics that re-cross slab boundaries
    (a few rounds for smooth media, more for strongly curved anisotropic
    wavefronts); the default budget is sized for ~8 slabs.

    Accuracy vs single-device global sweeps is numerics-sensitive: on some
    hosts the decomposition reaches the identical fixpoint, on others
    fp-rounding differences flip ALI stencil tie-breaks and the two
    converge to slightly different (equally valid) discrete solutions,
    independent of budget.  Measured on the divergent host (4 slabs,
    32x40, f64; bench_data/diag_halo.py, FINDINGS_r2.md): for isotropic
    media the differences concentrate in the near-source discretization
    zone -- relative gaps up to ~11% within ~10 cells of the source where
    t -> 0, but in ABSOLUTE terms max 2.1e-7 on a 3.6e-6 s scale, and the
    sharded field is as close to the analytic solution as the
    single-device field (2.0e-7 vs 1.5e-7 max |err|); beyond 10 cells
    agreement is within 3.3%.  Near-source accuracy in production comes
    from the telescoped source refinement (solver.solve_ttf), not raw
    sweeps, on either path.  Strongly anisotropic shear modes (qSV cusps)
    show larger scattered tie-break deviations (up to ~0.3 relative);
    prefer the single-chip solver when the grid fits one chip.
    """
    nd = mesh.devices.size
    Z = tt0.shape[-2]
    assert Z % nd == 0, (Z, nd)

    spec_grid = P(axis, None)
    spec_stif = P(axis, None, None)
    spec_fb = P(None, axis, None)

    def pad2(t):
        return jnp.pad(t, ((2, 2), (0, 0)), constant_values=INF)

    def local(tt, fixed, veln, velpn, vel_map, stif, fbs, dnx, gtab, ptab):
        # slab model with 2-row halos
        def padm(a, val=0.0):
            return jnp.pad(a, ((2, 2), (0, 0)), constant_values=val)

        blk = gridlib.Model(
            veln=padm(veln),
            velpn=jnp.pad(velpn, ((2, 2), (0, 0)), constant_values=1),
            vel_map=padm(vel_map, 1.0),
            stif=jnp.pad(stif, ((2, 2), (0, 0), (0, 0)), constant_values=1),
            group_tab=gtab,
            phase_tab=ptab,
            fallback_slowness=jnp.pad(
                fbs, ((0, 0), (2, 2), (0, 0)), constant_values=1.0
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
        t = pad2(tt)
        f = jnp.pad(fixed, ((2, 2), (0, 0)), constant_values=True)
        # halo rows are marked fixed so local sweeps treat them as boundary
        # data; their values refresh from the neighbour slab each exchange.
        # fori keeps one compiled sweep body regardless of round counts;
        # rounds >= n_outer switch to the replace-polish phase.
        t = jax.lax.fori_loop(
            0,
            n_outer + polish,
            lambda k, t: _halo_jacobi_block(
                t, blk, f, n_inner, axis, Z, replace=(k >= n_outer)
            ),
            t,
        )
        return t[2:-2]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            spec_grid, spec_grid, spec_grid, spec_grid, spec_grid,
            spec_stif, spec_fb, P(), P(None, None), P(None, None),
        ),
        out_specs=spec_grid,
        check_vma=False,
    )
    return jax.jit(fn)(
        tt0, fixed, model.veln, model.velpn, model.vel_map, model.stif,
        model.fallback_slowness, model.dnx, model.group_tab, model.phase_tab,
    )
