"""Model container and nearest-neighbour grid refinement.

TPU-native equivalents of the reference grid helpers:

* ``refine_nearest``   <- finer_grid_n   (Anis_TTF_rays.py:26-56)
* ``refine_nearest_3d``<- finer_grid_n_2 (Anis_TTF_rays.py:59-91)
* ``Model``            <- the (veln, velpn, vel_map, stif_den, tables, dnx)
  bundle threaded through every reference kernel.

The reference's nearest-neighbour upsampling by an odd factor ``s`` maps
fine index ``k`` to coarse index ``round(k / s)`` (each coarse point owns the
``s`` fine points centred on ``s*i``, clamped at the edges) -- here done with
a single gather instead of the reference's double loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import materials as mat

__all__ = ["refine_nearest", "refine_nearest_3d", "Model", "make_model"]


def _nearest_index(n_coarse: int, scale: int) -> jnp.ndarray:
    n_fine = scale * (n_coarse - 1) + 1
    k = jnp.arange(n_fine)
    # round(k / scale) with scale odd: ties cannot occur.
    return jnp.clip((k + scale // 2) // scale, 0, n_coarse - 1)


def refine_nearest(arr, scale: int, dtype=None):
    """Nearest-neighbour upsample of a 2D array by odd factor ``scale``.

    Output dims are ``scale * (n - 1) + 1`` like finer_grid_n
    (Anis_TTF_rays.py:42).  ``dtype`` replicates the reference's dtype
    parameter: the default there is int32 -- pass ``jnp.int32`` to replicate
    the (intentional, quirky) truncation of the orientation field during
    patch refinement (Anis_TTF_rays.py:27, :1527).
    """
    if scale == 1:
        return arr if dtype is None else arr.astype(dtype)
    iz = _nearest_index(arr.shape[0], scale)
    ix = _nearest_index(arr.shape[1], scale)
    out = arr[iz][:, ix]
    if dtype is not None:
        out = out.astype(dtype)
    return out


def refine_nearest_3d(arr, scale: int):
    """Nearest-neighbour upsample of a (Z, X, C) material array
    (finer_grid_n_2, Anis_TTF_rays.py:59-91)."""
    if scale == 1:
        return arr
    iz = _nearest_index(arr.shape[0], scale)
    ix = _nearest_index(arr.shape[1], scale)
    return arr[iz][:, ix]


# Fixed wave angles of the multi-stencil FD fallback families
# (fouds18_A, Anis_TTF_rays.py:283, :469-470, :702-704, :805):
# axis family 0 deg; diagonal family 45 deg (effective angle rounded);
# knight families at -round(atan(0.5) deg) = -27 and +27 deg.
_FOUDS_WAVE_ANGLES = (0.0, 45.0, -27.0, 27.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Model:
    """Material model on a regular grid plus precomputed per-point planes.

    Data fields are jnp arrays; ``has_stif`` and ``dnx`` are static leaves.
    ``fallback_slowness`` holds the four per-point group slownesses at the
    fixed fouds18_A wave angles (precomputed once -- they never change
    between sweep iterations).
    """

    veln: jnp.ndarray          # (Z, X) orientation, degrees
    velpn: jnp.ndarray         # (Z, X) int32 material index
    vel_map: jnp.ndarray       # (Z, X) velocity scale
    stif: jnp.ndarray          # (Z, X, 5) float (c22,c23,c33,c44,rho), MPa
    group_tab: jnp.ndarray     # (361, M)
    phase_tab: jnp.ndarray     # (361, M)
    fallback_slowness: jnp.ndarray  # (4, Z, X)
    # dnx is a data (traced) leaf so same-shape solver stages that differ
    # only in grid spacing share one compilation.
    dnx: jnp.ndarray
    # Unified per-cell group-velocity curves for the ray tracer: columns =
    # table materials followed by 1-degree-sampled Christoffel curves of the
    # unique stiffness rows; ray_curve_idx maps each cell to its column.
    # Exact for table cells; 1-degree linear sampling (~1e-5 relative) for
    # stiffness cells.  None when not precomputed (patch models).
    ray_curves: jnp.ndarray | None
    ray_curve_idx: jnp.ndarray | None
    # Group-direction offset vs phase angle per curve class (181, C), deg --
    # see _ray_curve_tables; None when not precomputed.
    ray_skew: jnp.ndarray | None
    has_stif: bool = dataclasses.field(metadata=dict(static=True))
    # Static column summaries (materials.column_info) of phase_tab /
    # group_tab / ray_curves: which material columns can be selected and
    # which are constant.  Lets interp_table skip the 181-knot hat expansion
    # for isotropic table materials -- the dominant cost of the sweep's
    # local update otherwise.  None -> no assumption (full expansion).
    phase_info: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    group_info: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    ray_info: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    skew_info: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True))
    # seed_sign replicates the travel/travel_finer_grid discrepancy in the
    # analytic source seeding: travel uses eff = (veln - angle) % 180
    # (Anis_TTF_rays.py:1558) while travel_finer_grid uses (veln + angle)
    # (Anis_TTF_rays.py:2234).
    # It is carried by the solver config, not the model.

    @property
    def shape(self):
        return self.veln.shape


def group_velocity_at(model: Model, eff_angle_deg):
    """Group velocity at per-point effective angle, dispatching between the
    table interpolation and the runtime Christoffel solve exactly like the
    reference kernels (e.g. Anis_TTF_rays.py:287-315)."""
    eff = jnp.mod(eff_angle_deg, 180.0)
    v_tab = mat.interp_table(model.group_tab, eff, model.velpn, model.vel_map,
                             info=model.group_info)
    if not model.has_stif:
        return v_tab
    v_chr = mat.group_velocity_christoffel(
        eff,
        model.stif[..., 0],
        model.stif[..., 1],
        model.stif[..., 2],
        model.stif[..., 3],
        model.stif[..., 4],
        model.vel_map,
    )
    return jnp.where(model.velpn != 0, v_tab, v_chr)


def phase_velocity_at(model: Model, eff_angle_deg, velpn=None, vel_map=None, stif=None):
    """Phase velocity at per-point effective angle (ALI update velocity,
    Anis_TTF_rays.py:1371-1406).  Optional overrides let callers evaluate at
    shifted/sliced material planes."""
    velpn = model.velpn if velpn is None else velpn
    vel_map = model.vel_map if vel_map is None else vel_map
    stif = model.stif if stif is None else stif
    eff = jnp.mod(eff_angle_deg, 180.0)
    v_tab = mat.interp_table(model.phase_tab, eff, velpn, vel_map,
                             info=model.phase_info)
    if not model.has_stif:
        return v_tab
    v_chr = mat.phase_velocity_christoffel(
        eff,
        stif[..., 0],
        stif[..., 1],
        stif[..., 2],
        stif[..., 3],
        stif[..., 4],
        vel_map,
    )
    return jnp.where(velpn != 0, v_tab, v_chr)


@partial(jax.jit, static_argnames=("has_stif",))
def _fallback_slowness_planes(veln, velpn, vel_map, stif, group_tab, has_stif):
    """Per-point group slowness at the four fixed fouds18_A wave angles.

    Family effective angles (replicated exactly):
      axis:     eff = (0 - veln) % 180            (Anis_TTF_rays.py:286)
      diagonal: eff = round((45 - veln) % 180)    (Anis_TTF_rays.py:470)
      knight A: eff = (-27 - veln) % 180          (Anis_TTF_rays.py:702-704)
      knight B: eff = (27 - veln) % 180           (Anis_TTF_rays.py:805)
    """
    effs = [
        jnp.mod(0.0 - veln, 180.0),
        jnp.round(jnp.mod(45.0 - veln, 180.0)),
        jnp.mod(-27.0 - veln, 180.0),
        jnp.mod(27.0 - veln, 180.0),
    ]
    planes = []
    for eff in effs:
        v_tab = mat.interp_table(group_tab, eff, velpn, vel_map)
        if has_stif:
            v_chr = mat.group_velocity_christoffel(
                eff,
                stif[..., 0],
                stif[..., 1],
                stif[..., 2],
                stif[..., 3],
                stif[..., 4],
                vel_map,
            )
            v = jnp.where(velpn != 0, v_tab, v_chr)
        else:
            v = v_tab
        planes.append(1.0 / v)
    return jnp.stack(planes)




# --------------------------------------------------------------------- #
# Host-side numpy mirrors of the L0 physics (materials.py) for model
# precomputation.  make_model runs on the host; evaluating these with jnp
# would dispatch ~100 primitives op-by-op to the accelerator (seconds of
# tunnel latency each on a remote TPU) or pay a jit compile for what is a
# one-off O(grid) precompute.  Formulas are identical to
# materials.group/phase_velocity_christoffel (float64 here, cast by the
# caller).
# --------------------------------------------------------------------- #


def _np_group_velocity_christoffel(angle_deg, c22, c23, c33, c44, rho,
                                   vel_scale=1.0):
    angle = np.mod(angle_deg, 180.0)
    m90 = np.mod(angle, 90.0)
    near_axis = (m90 < 0.01) | (m90 > 90.0 - 0.01)
    near_90 = np.abs(angle - 90.0) < 1.0
    lam_axis = np.where(near_90, c33, c22)
    v_axis = 1000.0 * vel_scale * np.sqrt(lam_axis / rho)
    ang_safe = np.where(near_axis, 45.0, angle)
    tan_ang = np.tan(np.radians(ang_safe))
    A = c22 + c33 - 2.0 * c44
    B = (c23 + c44) * (tan_ang - 1.0 / tan_ang)
    C = c22 - c33
    disc = np.sqrt(np.maximum(B * B + A * A - C * C, 0.0))
    denom = C - A
    denom = np.where(denom == 0.0, np.finfo(np.float64).tiny, denom)
    sign = np.where(ang_safe < 90.0, -1.0, 1.0)
    phase_ang = np.mod(np.arctan((-B + sign * disc) / denom), np.pi)
    lam = 0.5 * (
        np.cos(2.0 * phase_ang) * (c22 - c44)
        + np.sin(2.0 * phase_ang) * (c23 + c44) * tan_ang
        + c22
        + c44
    )
    v_gen = (
        1000.0
        * vel_scale
        * np.sqrt(np.maximum(lam, 0.0) / rho)
        / np.cos(np.radians(ang_safe) - phase_ang)
    )
    return np.where(near_axis, v_axis, v_gen)


def _np_phase_velocity_christoffel(angle_deg, c22, c23, c33, c44, rho,
                                   vel_scale=1.0):
    ca = np.cos(np.radians(angle_deg))
    sa = np.sin(np.radians(angle_deg))
    A = ca * ca * c22 + sa * sa * c44
    B = ca * sa * (c23 + c44)
    C = ca * ca * c44 + sa * sa * c33
    lam = 0.5 * (A + C + np.sqrt((A - C) ** 2 + 4.0 * B * B))
    return 1000.0 * vel_scale * np.sqrt(lam / rho)


def _np_interp_table(table, eff, mat_idx, vel_map):
    """Numpy mirror of materials.interp_table_gather
    (Anis_TTF_rays.py:288-291)."""
    eff = np.mod(eff, 180.0)
    a1 = np.clip(np.floor(eff).astype(np.int64), 0, 179)
    a2 = np.mod(a1 + 1, 180)
    w = eff - a1
    m = np.asarray(mat_idx, dtype=np.int64)
    v1 = table[a1, m]
    v2 = table[a2, m]
    return vel_map * ((1.0 - w) * v1 + w * v2)


def _np_fallback_slowness_planes(veln, velpn, vel_map, stif, group_tab,
                                 has_stif):
    """Numpy mirror of _fallback_slowness_planes for host precompute."""
    effs = [
        np.mod(0.0 - veln, 180.0),
        np.round(np.mod(45.0 - veln, 180.0)),
        np.mod(-27.0 - veln, 180.0),
        np.mod(27.0 - veln, 180.0),
    ]
    planes = []
    for eff in effs:
        v = _np_interp_table(group_tab, eff, velpn, vel_map)
        if has_stif:
            v_chr = _np_group_velocity_christoffel(
                eff, stif[..., 0], stif[..., 1], stif[..., 2],
                stif[..., 3], stif[..., 4], vel_map,
            )
            v = np.where(velpn != 0, v, v_chr)
        planes.append(1.0 / v)
    return np.stack(planes)


def _ray_curve_tables(velpn_np, stif_np, group_tab_np, phase_tab_np,
                      has_stif):
    """Host-side unified per-cell-class curve tables for the ray tracer.

    Returns (curves (181, M+U), skew (181, M+U), curve_idx (Z, X) int32):
    table material m keeps its exact reference group curve; each unique
    stiffness row gets the closed-form Christoffel group curve sampled at
    1 degree.  ``skew`` is the group-direction offset
    ``atan((dv_p/dphi) / v_p)`` in degrees as a function of *phase* angle
    phi (material frame) -- the characteristic-descent ray marcher turns a
    travel-time gradient (phase direction) into the ray (group) direction
    with one lookup.  Skew is scale-invariant, so vel_map drops out.
    """
    M = group_tab_np.shape[1]
    curves = [np.asarray(group_tab_np[:181], dtype=np.float64)]
    phase_cols = [np.asarray(phase_tab_np[:181], dtype=np.float64)]
    idx = np.asarray(velpn_np, dtype=np.int32).copy()
    if has_stif:
        flat = np.asarray(stif_np, dtype=np.float64).reshape(-1, 5)
        uniq, inv = np.unique(flat, axis=0, return_inverse=True)
        ang = np.arange(181.0)[:, None]
        ucurves = _np_group_velocity_christoffel(
            ang, uniq[None, :, 0], uniq[None, :, 1], uniq[None, :, 2],
            uniq[None, :, 3], uniq[None, :, 4],
        )
        upcurves = _np_phase_velocity_christoffel(
            ang, uniq[None, :, 0], uniq[None, :, 1], uniq[None, :, 2],
            uniq[None, :, 3], uniq[None, :, 4],
        )
        curves.append(ucurves)
        phase_cols.append(upcurves)
        stif_id = (M + inv.reshape(idx.shape)).astype(np.int32)
        idx = np.where(idx != 0, idx, stif_id).astype(np.int32)
    group = np.concatenate(curves, axis=1)
    phase = np.concatenate(phase_cols, axis=1)
    # d(v_p)/d(phi) per *radian* by 180-periodic central differences of the
    # 1-degree samples; column 0 of the table is the angle ramp (never a
    # selectable class) -- zero its skew rather than differentiating it.
    dv = np.empty_like(phase)
    dv[1:180] = (phase[2:181] - phase[0:179]) * (0.5 * 180.0 / np.pi)
    dv[0] = (phase[1] - phase[179]) * (0.5 * 180.0 / np.pi)
    dv[180] = dv[0]
    skew = np.degrees(np.arctan2(dv, phase))
    skew[:, 0] = 0.0
    return group, skew, idx


def make_model(
    veln,
    velpn,
    vel_map=None,
    stif_den=None,
    group_tab=None,
    phase_tab=None,
    dnx=1e-3,
    dtype=jnp.float32,
    device=True,
) -> Model:
    """Assemble a Model (with precomputed fallback-slowness planes).

    All precomputation (fallback slownesses, ray curve/skew tables) runs
    host-side in numpy -- a one-off O(grid) job that must not dispatch
    op-by-op to a (possibly remote) accelerator or pay a jit compile --
    and only the finished planes are transferred to the device.

    ``device=False`` keeps every field a host numpy array (no device_put
    at all): jit tracing/lowering over such a model never touches the
    accelerator, which matters for AOT compile checks in processes whose
    device runtime may be broken (e.g. a libtpu client/terminal version
    skew -- see MULTICHIP_r0*.json); transfers then happen lazily at
    first execution.
    """
    npdt = np.dtype(dtype)
    veln_np = np.asarray(veln).astype(npdt)
    velpn_np = np.asarray(velpn).astype(np.int32)
    if vel_map is None:
        vel_map_np = np.ones(veln_np.shape, dtype=npdt)
    else:
        vel_map_np = np.asarray(vel_map).astype(npdt)
    has_stif = stif_den is not None
    if has_stif:
        stif_np = np.asarray(stif_den).astype(npdt)
    else:
        stif_np = np.zeros(veln_np.shape + (5,), dtype=npdt)
    if group_tab is None or phase_tab is None:
        g, p = mat.default_tables()
        group_tab = g if group_tab is None else group_tab
        phase_tab = p if phase_tab is None else phase_tab
    group_tab_np = np.asarray(group_tab).astype(npdt)
    phase_tab_np = np.asarray(phase_tab).astype(npdt)
    fb = _np_fallback_slowness_planes(
        veln_np, velpn_np, vel_map_np, stif_np, group_tab_np, has_stif
    ).astype(npdt)
    curves, skew, curve_idx = _ray_curve_tables(
        velpn_np, stif_np, group_tab_np, phase_tab_np, has_stif
    )
    used = np.unique(velpn_np)
    used = used[used > 0]
    phase_info = mat.column_info(phase_tab_np, used)
    group_info = mat.column_info(group_tab_np, used)
    ray_info = mat.column_info(curves, np.unique(curve_idx))
    skew_info = mat.column_info(skew, np.unique(curve_idx))
    if device:
        put = jnp.asarray
    else:
        def put(a, dtype=None):
            a = np.asarray(a)
            return a if dtype is None else a.astype(dtype)
    return Model(
        veln=put(veln_np),
        velpn=put(velpn_np),
        vel_map=put(vel_map_np),
        stif=put(stif_np),
        group_tab=put(group_tab_np),
        phase_tab=put(phase_tab_np),
        fallback_slowness=put(fb),
        dnx=put(np.asarray(dnx, dtype=npdt)),
        ray_curves=put(curves, dtype=dtype),
        ray_curve_idx=put(curve_idx),
        ray_skew=put(skew, dtype=dtype),
        has_stif=has_stif,
        phase_info=phase_info,
        group_info=group_info,
        ray_info=ray_info,
        skew_info=skew_info,
    )


def refine_model(model: Model, scale: int, dtype=jnp.float32) -> Model:
    """NN-refine a whole model by odd factor ``scale`` with the reference's
    dtype quirks (veln via int32, velpn int, vel_map float32 --
    Anis_TTF_rays.py:2156-2163) and dnx scaled down."""
    if scale == 1:
        return model
    veln = refine_nearest(model.veln, scale, jnp.int32).astype(dtype)
    velpn = refine_nearest(model.velpn, scale, jnp.int32)
    vel_map = refine_nearest(model.vel_map, scale).astype(dtype)
    stif = refine_nearest_3d(model.stif, scale)
    fb = _fallback_slowness_planes(
        veln, velpn, vel_map, stif, model.group_tab, model.has_stif
    )
    curve_idx = (
        refine_nearest(model.ray_curve_idx, scale)
        if model.ray_curve_idx is not None
        else None
    )
    return Model(
        veln=veln,
        velpn=velpn,
        vel_map=vel_map,
        stif=stif,
        group_tab=model.group_tab,
        phase_tab=model.phase_tab,
        fallback_slowness=fb,
        dnx=model.dnx / scale,
        ray_curves=model.ray_curves,
        ray_curve_idx=curve_idx,
        ray_skew=model.ray_skew,
        has_stif=model.has_stif,
        phase_info=model.phase_info,
        group_info=model.group_info,
        ray_info=model.ray_info,
        skew_info=model.skew_info,
    )
