"""Per-source travel-time-field solves with telescoping source refinement.

TPU-native equivalent of the reference drivers:

* ``solve_ttf(..., subgrid_size=1)``  <- travel()            (Anis_TTF_rays.py:1463-2117)
* ``solve_ttf(..., subgrid_size=s)``  <- travel_finer_grid() (Anis_TTF_rays.py:2120-2832)

Structure mirrors the reference's telescoping: a small window around the
source is solved on a refined grid (27x / 9x / 3x for the coarse path;
9x / 3x on top of the global refinement for the fine path), each stage
seeding the next by injecting every 3rd point; the innermost window is
seeded analytically with straight rays through the (homogeneous) source
cell.  Each stage is solved by the parallel line-sweep driver instead of a
heap march; injected values whose time is below the first arrival at the
previous window's edge are frozen (the sweep analogue of FMM's "alive"
points), the rest remain improvable initial values.

All shapes are static: windows keep a fixed size and slide (clamped) at
grid borders, so a whole transducer array solves as one ``vmap`` over
sources.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import grid as gridlib
from . import materials as mats
from .ops import pallas_sweep, sweep
from .ops.stencils import INF

__all__ = ["SolveConfig", "solve_ttf", "solve_one"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveConfig:
    """Solver iteration budget.

    rel_tol gates only phase 1 (the min-accumulation envelope); the
    replace-polish phase sets the final values, so phase 1 only needs to get
    near the solution.  In float32 the pass-to-pass delta floors around
    5e-4 relative (tie-flipping at candidate boundaries), so tolerances
    below that simply burn max_passes.
    """

    rel_tol: float = dataclasses.field(default=1e-3, metadata=dict(static=True))
    patch_max_passes: int = dataclasses.field(default=10, metadata=dict(static=True))
    final_max_passes: int = dataclasses.field(default=16, metadata=dict(static=True))
    polish_passes: int = dataclasses.field(default=5, metadata=dict(static=True))
    # EXPERIMENTAL (off by default, and measured ineffective on the weld
    # workload): multigrid initialisation of the final full-grid stage --
    # solve a 3x-decimated model first and bilinearly prolong the result
    # as the initial guess.  Measured on the weld: no speedup (the
    # decimated model skips thin slow features, so the prolonged guess
    # *undershoots* in places and the monotone phase-1 sweep cannot raise
    # it back; only the polish phase can, and it converges slowly), and
    # up to 7e-2 relative error vs the default path.  Kept for reference;
    # do not enable for production solves.
    multigrid: bool = dataclasses.field(default=False, metadata=dict(static=True))
    mg_passes: int = dataclasses.field(default=12, metadata=dict(static=True))
    mg_polish: int = dataclasses.field(default=2, metadata=dict(static=True))
    # Final-stage-only overrides (None = inherit rel_tol / polish_passes).
    # The telescoped patches feed the final injection, so their budget
    # stays conservative; the final full-grid stage dominates solve time
    # (~70% measured on the weld) and tolerates a looser phase-1 gate --
    # its replace-mode polish sets the final values either way.  Measured
    # on the weld at (2e-3, 3): 0.35 s vs 0.54 s for the default
    # (1e-3, 5), 1.9e-2 max / 1.2e-3 mean relative deviation from a
    # 30-pass reference run (vs 1.6e-2 / 0.9e-3 for the default).
    final_rel_tol: float | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    final_polish_passes: int | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    # Residual-driven polish cap for the final stage: None keeps the
    # fixed-count polish; a value > final_polish_passes lets the replace
    # phase run until its pass-to-pass delta drops below the final
    # rel_tol (at least final_polish_passes rounds).  Used by the
    # accuracy preset and by the halo-sharded path, whose polish is
    # always residual-driven.
    final_max_polish: int | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    # Coarse-path stage-3 window half-size override (None = the
    # reference's 13, Anis_TTF_rays.py:1852-1853).  A wider window
    # freezes refined-patch values further out, IMPROVING accuracy vs
    # the analytic solution but WORSENING parity vs the reference
    # oracle: beyond r=13 the oracle's own values carry the coarse
    # march's accumulated error (~+1.9% vs analytic at r=18, measured
    # bench_data/diag_accuracy_r3.py), and matching the oracle means
    # reproducing that error.  Leave None for drop-in oracle parity;
    # set larger (e.g. 19) when absolute accuracy matters more than
    # reference parity.  Coarse path (subgrid_size == 1) only.
    stage3_half: int | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    # Lines per lax.scan step in the GS sweeps (ops/sweep._sweep_axis):
    # the inner lines are updated sequentially (unrolled) so results are
    # identical to block=1; larger blocks amortise per-step dispatch
    # latency, the dominant cost of the final full-grid stage.
    sweep_block: int = dataclasses.field(default=8, metadata=dict(static=True))
    patch_block: int = dataclasses.field(default=4, metadata=dict(static=True))
    # EXPERIMENTAL: parallel-in-block Jacobi iterations inside each sweep
    # block (ops/sweep.gs_pass ``inner``; see its docstring for the full
    # findings).  0 = strict sequential line order -- keep 0 for
    # production: the weld-scale sweeps are throughput-bound and inner=4
    # measured 4x SLOWER at worse accuracy.
    sweep_inner: int = dataclasses.field(default=0, metadata=dict(static=True))
    patch_inner: int = dataclasses.field(default=0, metadata=dict(static=True))
    # Local-update operator: True = ALI wavefront interpolation with FD
    # fallback (the reference's operator -- keep for qP/oracle parity).
    # False = pure multi-stencil FD (group-speed, monotone upwind).  For
    # CONCAVE modes (qSV triplication) the ALI phase-speed extrapolation
    # min-locked below the true first arrival when fed the round-3
    # INCONSISTENT shear tables (16-18% early vs the convex-hull truth,
    # FINDINGS_r4.md); with the consistent first-arrival table pair
    # (generate_mode_curves) ALI is sound for shear modes too, so this
    # stays True even under for_mode("qsv").  The monotone FD operator
    # remains available for experiments.
    use_ali: bool = dataclasses.field(default=True, metadata=dict(static=True))
    # Phase-1-only operator override (None = use_ali): monotone FD
    # envelope (overshoot-only), then full-ALI replace polish
    # contracting from above -- see ops/sweep.solve_fixpoint.  Measured
    # on homogeneous qSV with consistent tables: NOT better than ALI
    # everywhere (10x worse point asymmetry from sweep-history branch
    # selection in the FD envelope); kept as an experiment knob.
    phase1_use_ali: bool | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    # Final-stage replace-polish FD fallback (see stencils.local_update
    # ``use_fd``): False skips the multi-stencil FD candidate during the
    # final stage's polish passes only -- the fallback is ~75% of the
    # branchless update's cost yet ALI is valid almost everywhere on a
    # near-converged field; where it is not, the replace accumulation
    # keeps the phase-1 envelope value (which was computed WITH the
    # fallback).  Accuracy impact measured on the weld workload in
    # bench_data/diag_polish_r5.py; patch stages always keep the full
    # operator (they feed the injection).
    final_polish_fd: bool = dataclasses.field(
        default=True, metadata=dict(static=True))

    @classmethod
    def accuracy(cls, **overrides) -> "SolveConfig":
        """Accuracy preset: tight phase-1 gate, generous pass budgets and
        extra replace-mode polish.  Targets the BASELINE.md <= 1e-3
        relative L-inf bound vs the reference heap march (see
        tests/test_accuracy_mode.py); 2-3x slower than the default."""
        kw = dict(rel_tol=2e-4, patch_max_passes=16, final_max_passes=32,
                  polish_passes=8, final_rel_tol=2e-4,
                  final_polish_passes=8, final_max_polish=32)
        kw.update(overrides)
        return cls(**kw)

    @classmethod
    def for_mode(cls, mode: str = "qp", **overrides) -> "SolveConfig":
        """Budget preset per wave mode.

        Shear modes converge far slower than qP under the line sweeps
        (the qSV group curve's cusps bend characteristics repeatedly
        across sweep directions): single-device qSV measured ~80 passes
        to settle vs < 16 for qP (bench_data/FINDINGS_r2.md), so "qsv" /
        "qsh" get a 96-pass budget and extra polish.  Check the returned
        SolveInfo.converged from solve_ttf(..., return_info=True)."""
        m = mode.lower()
        if m in ("qp", "p", "l"):
            kw = {}
        elif m in ("qsv", "qsh", "sv", "sh", "s", "t"):
            # The standard ALI operator is sound for shear modes ONCE
            # the tables are the consistent first-arrival pair
            # (materials.generate_mode_curves: hull group + convexified
            # -slowness phase).  Round-4 measurements on homogeneous
            # qSV media vs the hull truth: ALI-everywhere converges to
            # mean ~6e-3 with 3-5e-3 point asymmetry and near-zero
            # undershoot; the FD-envelope hybrid (phase1_use_ali=False)
            # leaves 10x worse asymmetry; ALI with the RAW Christoffel
            # phase table min-locks 16-18% early (FINDINGS_r4.md).  So:
            # generous budgets + residual-driven polish, operator
            # unchanged.
            kw = dict(patch_max_passes=24, final_max_passes=96,
                      polish_passes=8, final_polish_passes=8,
                      final_max_polish=96)
        else:
            raise ValueError(f"unknown wave mode {mode!r}")
        kw.update(overrides)
        return cls(**kw)


def _window_origin(center, half, n):
    """Clamped origin of a (2*half+1)-wide window around ``center``."""
    return jnp.clip(center - half, 0, jnp.maximum(n - 1 - 2 * half, 0))


def _slice_model(model: gridlib.Model, bz, bx, hz, hx, factor, dtype):
    """Extract a (2hz+1, 2hx+1) window of the model at origin (bz, bx) and
    NN-refine it by ``factor`` with the reference dtype quirks
    (veln int32-truncated, vel_map via float32: Anis_TTF_rays.py:1527-1529).
    """
    wz, wx = 2 * hz + 1, 2 * hx + 1
    veln = jax.lax.dynamic_slice(model.veln, (bz, bx), (wz, wx))
    velpn = jax.lax.dynamic_slice(model.velpn, (bz, bx), (wz, wx))
    vel_map = jax.lax.dynamic_slice(model.vel_map, (bz, bx), (wz, wx))
    stif = jax.lax.dynamic_slice(
        model.stif, (bz, bx, jnp.zeros_like(bz)), (wz, wx, 5)
    )
    veln_f = gridlib.refine_nearest(veln, factor, jnp.int32).astype(dtype)
    velpn_f = gridlib.refine_nearest(velpn, factor)
    vel_map_f = (
        gridlib.refine_nearest(vel_map, factor).astype(jnp.float32).astype(dtype)
    )
    stif_f = gridlib.refine_nearest_3d(stif, factor)
    fb = gridlib._fallback_slowness_planes(
        veln_f, velpn_f, vel_map_f, stif_f, model.group_tab, model.has_stif
    )
    return gridlib.Model(
        veln=veln_f,
        velpn=velpn_f,
        vel_map=vel_map_f,
        stif=stif_f,
        group_tab=model.group_tab,
        phase_tab=model.phase_tab,
        fallback_slowness=fb,
        dnx=model.dnx / factor,
        ray_curves=None,
        ray_curve_idx=None,
        ray_skew=None,
        has_stif=model.has_stif,
        # patches carry the base model's (superset) column info
        phase_info=model.phase_info,
        group_info=model.group_info,
        ray_info=None,
    )


def _analytic_seed(patch: gridlib.Model, base: gridlib.Model, isz, isx,
                   src_z, src_x, side, seed_sign, dtype):
    """Straight-ray times through the homogeneous source cell
    (Anis_TTF_rays.py:1546-1590 for travel; :2222-2267 for the finer-grid
    variant, whose effective angle uses the opposite sign, :2234).

    ``(src_z, src_x)`` is the source position on the patch grid; material
    values are taken at the source cell of the *base* grid (isz, isx).
    Returns (tt, fixed) on the patch grid.
    """
    Z, X = patch.shape
    dz = jnp.arange(Z, dtype=dtype)[:, None] - src_z
    dx = jnp.arange(X, dtype=dtype)[None, :] - src_x
    dz = jnp.broadcast_to(dz, (Z, X))
    dx = jnp.broadcast_to(dx, (Z, X))
    in_seed = (jnp.abs(dz) <= side) & (jnp.abs(dx) <= side)

    dx_zero = dx == 0
    angle = jnp.where(
        dx_zero, 90.0, jnp.degrees(jnp.arctan(dz / jnp.where(dx_zero, 1.0, dx)))
    )
    v_src = base.veln[isz, isx]
    p_src = base.velpn[isz, isx]
    m_src = base.vel_map[isz, isx]
    s_src = base.stif[isz, isx]
    # seed_sign = -1 -> eff = (veln - angle) % 180   (travel, :1558)
    # seed_sign = +1 -> eff = (veln + angle) % 180   (travel_finer_grid, :2234)
    eff = jnp.mod(v_src + seed_sign * angle, 180.0)

    v_tab = mats.interp_table(
        patch.group_tab, eff, jnp.full((Z, X), p_src, jnp.int32),
        jnp.full((Z, X), m_src, dtype), info=patch.group_info,
    )
    if patch.has_stif:
        v_chr = mats.group_velocity_christoffel(
            eff, s_src[0], s_src[1], s_src[2], s_src[3], s_src[4], m_src
        )
        vel = jnp.where(p_src != 0, v_tab, v_chr)
    else:
        vel = v_tab
    tt = patch.dnx * jnp.sqrt(dz * dz + dx * dx) / vel
    tt = jnp.where(in_seed, tt, INF)
    return tt.astype(dtype), in_seed


def _edge_time(tt, origin, prev_factor, base_shape):
    """First-arrival time at the REAL borders of a patch field.

    Patch borders lying on the model boundary are excluded from the min:
    the reference's staged heap march stops only when the front crosses a
    *full-size* patch side (`abs(is_1 - i) == max_dist + 1`,
    Anis_TTF_rays.py:1651-1652, :1674-1675) -- a side clamped to the model
    boundary can never satisfy that test, so the march keeps finalising
    points next to it and those values stay frozen into the next stage.
    Taking the min over clamped borders too (they sit one cell from an
    edge source) used to unfreeze virtually the whole refined patch for
    edge sources, letting the coarse final stage re-derive near-source
    values at coarse resolution (~2x error one cell from the source).

    ``origin``: patch origin in base-grid cells; ``prev_factor``: the
    patch's refinement relative to the base grid; ``base_shape``: base
    grid (Z, X).
    """
    Zp, Xp = tt.shape[-2], tt.shape[-1]
    Z, X = base_shape
    wz = (Zp - 1) // prev_factor  # patch extent in base cells, minus 1
    wx = (Xp - 1) // prev_factor
    bz, bx = origin
    big = jnp.where(tt < INF * 0.5, tt, INF)
    t_top = jnp.where(bz == 0, INF, big[0, :].min())
    t_bot = jnp.where(bz + wz >= Z - 1, INF, big[-1, :].min())
    t_left = jnp.where(bx == 0, INF, big[:, 0].min())
    t_right = jnp.where(bx + wx >= X - 1, INF, big[:, -1].min())
    return jnp.minimum(
        jnp.minimum(t_top, t_bot), jnp.minimum(t_left, t_right)
    )


def _inject(prev_tt, prev_origin, prev_factor, cur_shape, cur_origin,
            cur_factor, dtype, base_shape):
    """Inject every-3rd-point of the previous stage into the current grid.

    ``prev_origin``/``cur_origin`` are window origins in base-grid cells;
    ``cur_factor`` is the current grid's refinement relative to the base
    grid and ``prev_factor`` the previous stage's (= 3 * cur_factor).  The
    stride-3 subsample of the previous stage has exactly the current
    grid's spacing.  Values at or below the first arrival on the previous
    patch's *real* borders are frozen (see _edge_time).
    Returns (tt_init, fixed_mask).
    """
    sub = prev_tt[::3, ::3]
    t_edge = _edge_time(prev_tt, prev_origin, prev_factor, base_shape)
    off_z = (prev_origin[0] - cur_origin[0]) * cur_factor
    off_x = (prev_origin[1] - cur_origin[1]) * cur_factor
    tt = jnp.full(cur_shape, INF, dtype=dtype)
    tt = jax.lax.dynamic_update_slice(tt, sub, (off_z, off_x))
    fixed = jnp.zeros(cur_shape, bool)
    fixed = jax.lax.dynamic_update_slice(
        fixed, sub <= t_edge, (off_z, off_x)
    )
    return tt, fixed


def solve_one(
    model: gridlib.Model,
    scx,
    scz,
    stages,
    seed_side: int,
    seed_sign: float,
    cfg: SolveConfig = SolveConfig(),
):
    """Travel-time field for a single source on ``model``'s grid.

    ``stages``: tuple of (window_half_size_cells, refine_factor), outermost
    last; factors must step down by 3x and end at 3.
    """
    dtype = model.vel_map.dtype
    Z, X = model.shape
    isx = jnp.round(scx / model.dnx).astype(jnp.int32)
    isz = jnp.round(scz / model.dnx).astype(jnp.int32)

    prev_tt = None
    prev_origin = None
    for k, (half, factor) in enumerate(stages):
        hz = min(half, (Z - 1) // 2)
        hx = min(half, (X - 1) // 2)
        bz = _window_origin(isz, hz, Z)
        bx = _window_origin(isx, hx, X)
        patch = _slice_model(model, bz, bx, hz, hx, factor, dtype)
        if k == 0:
            src_z = (isz - bz) * factor
            src_x = (isx - bx) * factor
            tt, fixed = _analytic_seed(
                patch, model, isz, isx, src_z, src_x, seed_side, seed_sign,
                dtype,
            )
        else:
            tt, fixed = _inject(
                prev_tt, prev_origin, 3 * factor, patch.shape, (bz, bx),
                factor, dtype, (Z, X),
            )
        tt, _ = sweep.solve_fixpoint(
            tt, patch, fixed, rel_tol=cfg.rel_tol,
            max_passes=cfg.patch_max_passes,
            polish_passes=cfg.polish_passes, use_ali=cfg.use_ali,
            phase1_use_ali=cfg.phase1_use_ali,
        )
        prev_tt, prev_origin = tt, (bz, bx)

    # final full-grid stage (factor 1)
    tt, fixed = _inject(prev_tt, prev_origin, 3, (Z, X), (0, 0), 1, dtype,
                        (Z, X))
    f_tol = cfg.rel_tol if cfg.final_rel_tol is None else cfg.final_rel_tol
    f_pol = (cfg.polish_passes if cfg.final_polish_passes is None
             else cfg.final_polish_passes)
    tt, n = sweep.solve_fixpoint(
        tt, model, fixed, rel_tol=f_tol,
        max_passes=cfg.final_max_passes, polish_passes=f_pol,
        use_ali=cfg.use_ali, phase1_use_ali=cfg.phase1_use_ali,
    )
    return tt


# Coarse-path constants (travel, Anis_TTF_rays.py:1513-1514, :1685-1686,
# :1852-1853): windows of +-2/+-6/+-13 cells at 27x/9x/3x; analytic seed out
# to +-13 fine points; effective seed angle (veln - angle).
_COARSE_STAGES = ((2, 27), (6, 9), (13, 3))
_COARSE_SEED_SIDE = 13
_COARSE_SEED_SIGN = -1.0


def coarse_stages(cfg: SolveConfig):
    """The coarse-path stage schedule, with cfg.stage3_half applied."""
    if cfg.stage3_half is None:
        return _COARSE_STAGES
    return _COARSE_STAGES[:-1] + ((cfg.stage3_half, 3),)


def fine_stage_params(subgrid_size: int):
    """Stage geometry of travel_finer_grid (Anis_TTF_rays.py:2188-2190,
    :2355-2356), in fine-grid cells."""
    s = subgrid_size
    size1 = 2 * s + (s - 1) // 2
    side1 = (9 - 1) // 2 + 9 * ((s - 1) // 2)
    size2 = size1 + 3 * s
    return ((size1, 9), (size2, 3)), side1


def solve_ttf(
    model: gridlib.Model,
    scx,
    scz,
    subgrid_size: int = 1,
    cfg: SolveConfig = SolveConfig(),
    progress=None,
    return_info=False,
):
    """Travel-time fields for a batch of sources (vmapped).

    ``scx``/``scz`` are 1D coordinate arrays.  With ``subgrid_size == 1``
    this is the parallel of ALI_FMM.update / travel(); with larger odd
    values the whole model is NN-refined first like travel_finer_grid().
    Returns (n_src, Zf, Xf).

    ``progress``: optional callable ``progress(stage, total, name,
    seconds)`` invoked after each telescoping stage completes (the
    sweep-driver equivalent of the reference's per-source tqdm bars,
    Anis_TTF_rays.py:3907).  When set, each stage is synchronised
    (block_until_ready) so ``seconds`` is real wall-clock including any
    compile -- leave None for production timing runs to keep dispatch
    fully asynchronous.

    ``return_info=True``: returns ``(fields, SolveInfo)`` where the info
    records the final full-grid stage's phase-1 pass count and whether it
    converged below ``cfg.final_rel_tol`` within ``cfg.final_max_passes``
    -- the convergence signal the reference never surfaced.  Shear modes
    (qSV) need far larger budgets than qP: check ``info.converged`` or
    use ``SolveConfig.for_mode("qsv")``.
    """
    if subgrid_size == 1:
        base = model
        stages, seed_side, seed_sign = (
            coarse_stages(cfg),
            _COARSE_SEED_SIDE,
            _COARSE_SEED_SIGN,
        )
    else:
        base = gridlib.refine_model(model, subgrid_size,
                                    dtype=model.vel_map.dtype)
        stages, seed_side = fine_stage_params(subgrid_size)
        seed_sign = +1.0
    return _staged_solve(base, jnp.asarray(scx), jnp.asarray(scz), stages,
                         seed_side, seed_sign, cfg, progress=progress,
                         return_info=return_info)


# --------------------------------------------------------------------- #
# Stage-jitted pipeline: one jitted program per telescoping stage instead
# of one giant program for the whole solve.  Un-jitted vmap dispatches
# primitive-by-primitive (catastrophic over the device tunnel); a single
# whole-pipeline jit makes XLA optimisation time explode superlinearly.
# Four medium programs compile in minutes and cache persistently.
# --------------------------------------------------------------------- #


def _patch_solve_batched(tt, patches, fixed, factor, model, cfg, use_pallas):
    """Fixpoint-solve a batch of per-source patches: Pallas kernel with
    per-source material planes, or the vmapped XLA sweep."""
    if not use_pallas:
        def one(tt_i, patch_i, fixed_i):
            out, _ = sweep.solve_fixpoint(
                tt_i, patch_i, fixed_i, rel_tol=cfg.rel_tol,
                max_passes=cfg.patch_max_passes,
                polish_passes=cfg.polish_passes,
                block=cfg.patch_block, inner=cfg.patch_inner,
                use_ali=cfg.use_ali, phase1_use_ali=cfg.phase1_use_ali,
            )
            return out
        return jax.vmap(one)(tt, patches, fixed)
    coeff = jax.vmap(pallas_sweep.phase_coeff_planes)(patches)  # (B,4,Z,X)
    mats_b = jax.vmap(pallas_sweep._mats_planes)(patches, coeff)
    mats_b = jnp.moveaxis(mats_b, 0, 1)  # (9, B, Z, X)
    out, _ = pallas_sweep.solve_fixpoint_pallas(
        tt, model, fixed, rel_tol=cfg.rel_tol,
        max_passes=cfg.patch_max_passes, polish_passes=cfg.polish_passes,
        mats=mats_b, per_source=True,
        dnx=model.dnx / factor,
    )
    return out


@partial(
    jax.jit,
    static_argnames=(
        "half", "factor", "seed_side", "seed_sign", "cfg", "use_pallas"
    ),
)
def _stage_first(model, scx, scz, half, factor, seed_side, seed_sign, cfg,
                 use_pallas=False):
    Z, X = model.shape

    def prep(cx, cz):
        isx = jnp.round(cx / model.dnx).astype(jnp.int32)
        isz = jnp.round(cz / model.dnx).astype(jnp.int32)
        hz = min(half, (Z - 1) // 2)
        hx = min(half, (X - 1) // 2)
        bz = _window_origin(isz, hz, Z)
        bx = _window_origin(isx, hx, X)
        patch = _slice_model(model, bz, bx, hz, hx, factor,
                             model.vel_map.dtype)
        tt, fixed = _analytic_seed(
            patch, model, isz, isx, (isz - bz) * factor, (isx - bx) * factor,
            seed_side, seed_sign, model.vel_map.dtype,
        )
        return tt, fixed, patch, bz, bx

    tt, fixed, patches, bz, bx = jax.vmap(prep)(scx, scz)
    tt = _patch_solve_batched(tt, patches, fixed, factor, model, cfg,
                              use_pallas)
    return tt, bz, bx


@partial(jax.jit, static_argnames=("half", "factor", "cfg", "use_pallas"))
def _stage_next(model, scx, scz, prev_tt, prev_bz, prev_bx, half, factor,
                cfg, use_pallas=False):
    Z, X = model.shape

    def prep(cx, cz, ptt, pbz, pbx):
        isx = jnp.round(cx / model.dnx).astype(jnp.int32)
        isz = jnp.round(cz / model.dnx).astype(jnp.int32)
        hz = min(half, (Z - 1) // 2)
        hx = min(half, (X - 1) // 2)
        bz = _window_origin(isz, hz, Z)
        bx = _window_origin(isx, hx, X)
        patch = _slice_model(model, bz, bx, hz, hx, factor,
                             model.vel_map.dtype)
        tt, fixed = _inject(ptt, (pbz, pbx), 3 * factor, patch.shape,
                            (bz, bx), factor, model.vel_map.dtype, (Z, X))
        return tt, fixed, patch, bz, bx

    tt, fixed, patches, bz, bx = jax.vmap(prep)(scx, scz, prev_tt, prev_bz,
                                                prev_bx)
    tt = _patch_solve_batched(tt, patches, fixed, factor, model, cfg,
                              use_pallas)
    return tt, bz, bx


def _decimate_model(model: gridlib.Model, c: int) -> gridlib.Model:
    """Stride-``c`` decimation of a model (coarse node k at fine node c*k);
    used only to build multigrid initial guesses, so ray tables are
    dropped."""
    return gridlib.Model(
        veln=model.veln[::c, ::c],
        velpn=model.velpn[::c, ::c],
        vel_map=model.vel_map[::c, ::c],
        stif=model.stif[::c, ::c],
        group_tab=model.group_tab,
        phase_tab=model.phase_tab,
        fallback_slowness=model.fallback_slowness[:, ::c, ::c],
        dnx=model.dnx * c,
        ray_curves=None,
        ray_curve_idx=None,
        ray_skew=None,
        has_stif=model.has_stif,
        phase_info=model.phase_info,
        group_info=model.group_info,
        ray_info=None,
        skew_info=None,
    )


def _prolong3(tt_c, Z, X):
    """Exact bilinear 3x prolongation aligned on coarse node k <-> fine node
    3k (gather-free: nine shifted weighted combinations, interleaved)."""
    B, Zc, Xc = tt_c.shape
    t = jnp.concatenate([tt_c, tt_c[:, -1:, :]], 1)
    t = jnp.concatenate([t, t[:, :, -1:]], 2)
    rows = []
    for rz in range(3):
        wz = rz / 3.0
        cols = []
        for rx in range(3):
            wx = rx / 3.0
            v = (
                (1 - wz) * (1 - wx) * t[:, :Zc, :Xc]
                + (1 - wz) * wx * t[:, :Zc, 1 : Xc + 1]
                + wz * (1 - wx) * t[:, 1 : Zc + 1, :Xc]
                + wz * wx * t[:, 1 : Zc + 1, 1 : Xc + 1]
            )
            cols.append(v)
        rows.append(jnp.stack(cols, -1).reshape(B, Zc, 3 * Xc))
    up = jnp.stack(rows, 2).reshape(B, 3 * Zc, 3 * Xc)
    return up[:, :Z, :X]


@partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def _stage_final(model, prev_tt, prev_bz, prev_bx, cfg, use_pallas=False):
    Z, X = model.shape

    def inject_one(ptt, pbz, pbx):
        return _inject(ptt, (pbz, pbx), 3, (Z, X), (0, 0), 1,
                       model.vel_map.dtype, (Z, X))

    tt, fixed = jax.vmap(inject_one)(prev_tt, prev_bz, prev_bx)
    if cfg.multigrid:
        import warnings

        warnings.warn(
            "SolveConfig.multigrid is experimental and known to DEGRADE "
            "accuracy (up to 7e-2 relative error on the weld workload: the "
            "prolonged coarse guess undershoots and the monotone phase-1 "
            "sweep cannot raise it) with no measured speedup; do not use "
            "for production solves.",
            stacklevel=2,
        )
        cm = _decimate_model(model, 3)
        tt_c, _ = sweep.solve_fixpoint(
            tt[:, ::3, ::3], cm, fixed[:, ::3, ::3], rel_tol=cfg.rel_tol,
            max_passes=cfg.mg_passes, polish_passes=cfg.mg_polish,
        )
        up = _prolong3(tt_c, Z, X)
        tt = jnp.where(tt < INF * 0.5, tt, up)
    f_tol = cfg.rel_tol if cfg.final_rel_tol is None else cfg.final_rel_tol
    f_pol = (cfg.polish_passes if cfg.final_polish_passes is None
             else cfg.final_polish_passes)
    if use_pallas:
        tt, _ = pallas_sweep.solve_fixpoint_pallas(
            tt, model, fixed, rel_tol=f_tol,
            max_passes=cfg.final_max_passes,
            polish_passes=f_pol,
        )
        return tt, sweep.SolveInfo(
            passes=jnp.asarray(cfg.final_max_passes),
            converged=jnp.asarray(True),
        )
    tt, info = sweep.solve_fixpoint(
        tt, model, fixed, rel_tol=f_tol,
        max_passes=cfg.final_max_passes, polish_passes=f_pol,
        block=cfg.sweep_block, inner=cfg.sweep_inner,
        max_polish_passes=cfg.final_max_polish, use_ali=cfg.use_ali,
        phase1_use_ali=cfg.phase1_use_ali,
        polish_use_fd=cfg.final_polish_fd,
    )
    return tt, info


def _use_pallas(model) -> bool:
    """Pallas sweeps: opt-in via ALIFMM_PALLAS=1 (needs TPU + constant
    table columns).  STATUS (round 3): RETIRED from the production path.

    Two strikes, measured on the weld workload:
    * round 2 (v5e, interpreter-validated kernel semantics): after the
      constant-column interp_table fast path, the XLA line-sweep scans
      run at ~13 us/line and *beat* the kernel's chunked launches
      (84 ms vs 310 ms for the 31-source patch stage);
    * round 3 (real-TPU compile attempt): Mosaic REJECTS the kernel --
      "Unsupported target bitwidth for truncation"
      (bench_data/FINDINGS_r3.md) -- it had only ever run under the
      Pallas interpreter.
    The XLA scans are the production sweep tier; the kernel remains an
    interpreter-mode testbed for update-semantics experiments
    (tests/test_pallas_sweep.py).
    """
    import os

    if os.environ.get("ALIFMM_PALLAS") != "1":
        return False
    return (
        jax.default_backend() == "tpu"
        and pallas_sweep.supports_model(model)
    )


def _staged_solve(base, scx, scz, stages, seed_side, seed_sign, cfg,
                  progress=None, return_info=False):
    import time as _time

    up = _use_pallas(base)
    total = len(stages) + 1

    def note(k, name, tt, t0):
        if progress is None:
            return
        tt.block_until_ready()
        progress(stage=k, total=total, name=name,
                 seconds=_time.perf_counter() - t0)

    t0 = _time.perf_counter()
    (h0, f0) = stages[0]
    tt, bz, bx = _stage_first(base, scx, scz, h0, f0, seed_side,
                              float(seed_sign), cfg, use_pallas=up)
    note(1, f"patch {f0}x (half={h0})", tt, t0)
    for k, (h, f) in enumerate(stages[1:], start=2):
        t0 = _time.perf_counter()
        tt, bz, bx = _stage_next(base, scx, scz, tt, bz, bx, h, f, cfg,
                                 use_pallas=up)
        note(k, f"patch {f}x (half={h})", tt, t0)
    t0 = _time.perf_counter()
    out, info = _stage_final(base, tt, bz, bx, cfg, use_pallas=up)
    note(total, "final full-grid", out, t0)
    if return_info:
        return out, info
    return out
