"""Branchless, fully-vectorised local eikonal update (the TPU "kernel").

This re-derives the reference's two local solvers as masked array math so a
single evaluation updates *every* grid point at once (the reference applies
them one heap-pop at a time):

* ALI wavefront-interpolation update  <- update() + wavefront_angle_dist()
  (Anis_TTF_rays.py:904-1460): 8 square stencils, 8 triangular stencils,
  stencil selection by minimum travel-time difference, linear wavefront
  interpolation, phase velocity at the wavefront-normal angle.
* Multi-stencil FD fallback           <- fouds18_A()
  (Anis_TTF_rays.py:240-901): axis / diagonal / two knight's-move stencil
  families with first/second-order upwind quadratic solves, group velocity
  at the family's fixed wave angle.

Unknown points carry the sentinel ``INF``; neighbours out of the grid are
INF as well (via padding), which reproduces the reference's in-bounds +
known-status tests (nsts >= 0 / nsts == 0) at every interior point.  The
triangular-stencil boundary special cases take explicit edge masks.

The update is written against a dict of neighbour views so the same code
runs on full grids, row bands and column bands (for Gauss-Seidel line
sweeps) and under vmap over sources.

fouds18_A skips a whole (j, k) quadrant / knight pair when either primary
coordinate leaves the grid, so the fallback additionally takes explicit
in-bounds masks (INF padding alone is not equivalent at grid edges).

Known, documented deviation from the reference: it calls update() with nnz
accidentally swapped for nnx at one stage-1 call site
(Anis_TTF_rays.py:1645); not replicated.
"""

from __future__ import annotations

import contextlib
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import grid as gridlib

INF = 1.0e9

# Swappable arctan: the XLA path uses jnp.arctan (bit-parity with the
# reference); Mosaic has no atan lowering, so the Pallas kernel swaps in
# the Cephes atanf polynomial below while its body is being traced.
_ATAN = [jnp.arctan]


def atan_poly(x):
    """Branchless single-precision arctan (Cephes atanf scheme: range
    reduction at tan(pi/8) / tan(3pi/8) + degree-4 polynomial in x^2;
    ~1 ulp in float32).  Used inside Pallas kernels where lax.atan has no
    Mosaic lowering."""
    sign = x < 0.0
    ax = jnp.abs(x)
    t3p8 = 2.414213562373095
    tp8 = 0.4142135623730950
    big = ax > t3p8
    mid = (ax > tp8) & (~big)
    safe = jnp.maximum(ax, 1e-30)
    xx = jnp.where(big, 1.0 / safe, jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    z = xx * xx
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1)
        * z
        - 3.33329491539e-1
    ) * z * xx + xx
    y = jnp.where(
        big, np.pi / 2 - p, jnp.where(mid, np.pi / 4 + p, p)
    )
    return jnp.where(sign, -y, y)


@contextlib.contextmanager
def use_atan(fn):
    """Swap the arctan implementation while tracing a kernel body."""
    _ATAN.insert(0, fn)
    try:
        yield
    finally:
        _ATAN.pop(0)
_BIG_DIFF = 1.0e30
SQRT2 = math.sqrt(2.0)
SQRT5 = math.sqrt(5.0)

# All 24 neighbour offsets (dz, dx) used by the two solvers.
OFFSETS: Tuple[Tuple[int, int], ...] = tuple(
    (dz, dx)
    for dz in (-2, -1, 0, 1, 2)
    for dx in (-2, -1, 0, 1, 2)
    if not (dz == 0 and dx == 0)
)

# Square ALI stencils: (A=far point, P, Q) offsets; diff = |t(P) - t(Q)|
# (Anis_TTF_rays.py:937-1033).
_SQ = (
    ((-2, 0), (-1, -1), (-1, 1)),
    ((0, 2), (-1, 1), (1, 1)),
    ((2, 0), (1, -1), (1, 1)),
    ((0, -2), (-1, -1), (1, -1)),
    ((-1, -1), (0, -1), (-1, 0)),
    ((-1, 1), (-1, 0), (0, 1)),
    ((1, 1), (1, 0), (0, 1)),
    ((1, -1), (0, -1), (1, 0)),
)

# Triangular ALI stencils: (F=far, M=mid, D=diag) offsets, the edge where the
# M-branch degenerates, the degenerate (angle, dist)=(edge_angle, 1), and the
# wavefront-time rule ('B' = the selected closer point; 'D' = always t(D),
# replicating the stencil-0 quirk at Anis_TTF_rays.py:1274)
# (Anis_TTF_rays.py:1146-1365).
_TRI = (
    dict(F=(2, 0), M=(1, 0), D=(1, 1), edge="left", eang=90.0, wt="D"),
    dict(F=(-2, 0), M=(-1, 0), D=(-1, 1), edge="left", eang=90.0, wt="B"),
    dict(F=(-2, 0), M=(-1, 0), D=(-1, -1), edge="right", eang=90.0, wt="B"),
    dict(F=(2, 0), M=(1, 0), D=(1, -1), edge="right", eang=90.0, wt="B"),
    dict(F=(0, -2), M=(0, -1), D=(1, -1), edge="top", eang=0.0, wt="B"),
    dict(F=(0, 2), M=(0, 1), D=(1, 1), edge="top", eang=0.0, wt="B"),
    dict(F=(0, 2), M=(0, 1), D=(-1, 1), edge="bottom", eang=0.0, wt="B"),
    dict(F=(0, -2), M=(0, -1), D=(-1, -1), edge="bottom", eang=0.0, wt="B"),
)

# Knight's-move stencil point cycles (fouds18_A families 3 and 4,
# Anis_TTF_rays.py:740-741 and :839-840), as (dz, dx).
_KNIGHT_A = ((-2, -1), (-1, 2), (2, 1), (1, -2))
_KNIGHT_B = ((-2, 1), (1, 2), (2, -1), (-1, -2))


def _wavefront_angle_dist(xA, zA, xB, zB, xC, zC, yA, yB, yC):
    """Vectorised wavefront_angle_dist (Anis_TTF_rays.py:1413-1460) with the
    target point at the origin.  Returns (angle_deg, dist); dist = -1 marks
    the degenerate case yC == yA."""
    denom = yC - yA
    degen = denom == 0.0
    denom_safe = jnp.where(degen, 1.0, denom)
    a = (yB - yA) / denom_safe
    xpos = (1.0 - a) * xA + a * xC
    zpos = (1.0 - a) * zA + a * zC
    dx = xB - xpos
    dz = zB - zpos
    dx_zero = dx == 0.0
    dx_safe = jnp.where(dx_zero, 1.0, dx)
    angle = jnp.mod(jnp.degrees(_ATAN[0](dz / dx_safe)) + 90.0, 180.0)
    angle = jnp.where(dx_zero, 0.0, angle)
    norm = jnp.sqrt(dx * dx + dz * dz)
    norm_safe = jnp.where(norm == 0.0, 1.0, norm)
    dist = jnp.abs(dz * xB - dx * zB) / norm_safe
    dist = jnp.where(degen | (norm == 0.0), -1.0, dist)
    angle = jnp.where(degen, 0.0, angle)
    return angle, dist


def _wavefront_vec_dist(xA, zA, xB, zB, xC, zC, yA, yB, yC):
    """_wavefront_angle_dist with the arctan deferred: returns
    (dx, dz, zero_angle, dist) where the wavefront-normal angle is
    ``mod(degrees(arctan(dz/dx)) + 90, 180)`` (0 where zero_angle) --
    computed ONCE on the *selected* stencil by the caller instead of per
    stencil (16 arctans -> 1 per update point; bit-identical values since
    the same dz/dx reaches the same formula)."""
    denom = yC - yA
    degen = denom == 0.0
    denom_safe = jnp.where(degen, 1.0, denom)
    a = (yB - yA) / denom_safe
    xpos = (1.0 - a) * xA + a * xC
    zpos = (1.0 - a) * zA + a * zC
    dx = xB - xpos
    dz = zB - zpos
    zero_ang = degen | (dx == 0.0)
    norm = jnp.sqrt(dx * dx + dz * dz)
    norm_safe = jnp.where(norm == 0.0, 1.0, norm)
    dist = jnp.abs(dz * xB - dx * zB) / norm_safe
    dist = jnp.where(degen | (norm == 0.0), -1.0, dist)
    return dx, dz, zero_ang, dist


def _ali_candidate(nbr, known, edges):
    """Best ALI stencil for every point: returns (angle, dist, wtime,
    inputs_max) with dist = -1 where no stencil is usable (-> fouds
    fallback).  ``inputs_max`` is the largest stencil value used, for the
    optional causality filter of the iterative driver.

    Selection is a running strict-less minimum over the unrolled stencils
    (first stencil wins ties -- identical to the reference's sequential
    if-chains and to argmin-over-stack semantics) so no stack / argmin /
    gather appears: the whole selection fuses into predicated vector math,
    which also keeps it legal inside a Pallas kernel.  The wavefront
    normal is carried as a (dx, dz) vector through the selection and the
    arctan runs once at the end (_wavefront_vec_dist).
    """
    # ---- square stencils --------------------------------------------------
    sq_min_diff = None
    for (A, P, Q) in _SQ:
        tA, tP, tQ = nbr[A], nbr[P], nbr[Q]
        valid = known[A] & known[P] & known[Q]
        diff = jnp.where(valid, jnp.abs(tP - tQ), _BIG_DIFF)
        swap = tP < tQ  # B = the smaller of P, Q; ties -> Q (strict <)
        xB = jnp.where(swap, P[1], Q[1]).astype(tA.dtype)
        zB = jnp.where(swap, P[0], Q[0]).astype(tA.dtype)
        xC = jnp.where(swap, Q[1], P[1]).astype(tA.dtype)
        zC = jnp.where(swap, Q[0], P[0]).astype(tA.dtype)
        yB = jnp.where(swap, tP, tQ)
        yC = jnp.where(swap, tQ, tP)
        vdx, vdz, zro, dst = _wavefront_vec_dist(
            float(A[1]), float(A[0]), xB, zB, xC, zC, tA, yB, yC
        )
        mx = jnp.maximum(tA, jnp.maximum(tP, tQ))
        if sq_min_diff is None:
            sq_min_diff, sq_dx, sq_dz, sq_zero, sq_dist, sq_wtime, sq_max = (
                diff, vdx, vdz, zro, dst, yB, mx
            )
        else:
            better = diff < sq_min_diff
            sq_dx = jnp.where(better, vdx, sq_dx)
            sq_dz = jnp.where(better, vdz, sq_dz)
            sq_zero = jnp.where(better, zro, sq_zero)
            sq_dist = jnp.where(better, dst, sq_dist)
            sq_wtime = jnp.where(better, yB, sq_wtime)
            sq_max = jnp.where(better, mx, sq_max)
            sq_min_diff = jnp.where(better, diff, sq_min_diff)
    sq_any = sq_min_diff < _BIG_DIFF

    # ---- triangular stencils ----------------------------------------------
    c1 = SQRT2 - 1.0
    c2 = 2.0 - SQRT2
    tri_min_diff = None
    for spec in _TRI:
        F, M, D = spec["F"], spec["M"], spec["D"]
        tF, tM, tD = nbr[F], nbr[M], nbr[D]
        valid = known[F] & known[M] & known[D] & (tF < jnp.minimum(tM, tD))
        diff = jnp.where(valid, jnp.abs(c1 * tF + c2 * tM - tD), _BIG_DIFF)
        m_branch = tM < tD
        xB = jnp.where(m_branch, M[1], D[1]).astype(tF.dtype)
        zB = jnp.where(m_branch, M[0], D[0]).astype(tF.dtype)
        xC = jnp.where(m_branch, D[1], M[1]).astype(tF.dtype)
        zC = jnp.where(m_branch, D[0], M[0]).astype(tF.dtype)
        yB = jnp.where(m_branch, tM, tD)
        yC = jnp.where(m_branch, tD, tM)
        vdx, vdz, zro, dst = _wavefront_vec_dist(
            float(F[1]), float(F[0]), xB, zB, xC, zC, tF, yB, yC
        )
        # Boundary degenerate case only taken in the M-branch
        # (Anis_TTF_rays.py:1264-1268 etc.): fixed angle, dist = 1 --
        # carried as an angle override so the deferred arctan still
        # reproduces the constant exactly.
        on_edge = m_branch & edges[spec["edge"]]
        ovr = on_edge
        oang = jnp.where(on_edge, spec["eang"], 0.0)
        dst = jnp.where(on_edge, 1.0, dst)
        if spec["wt"] == "D":
            wt = tD
        else:
            wt = yB
        mx = jnp.maximum(tM, tD)  # tF < min(tM, tD) when valid
        if tri_min_diff is None:
            (tri_min_diff, tri_dx, tri_dz, tri_zero, tri_ovr, tri_oang,
             tri_dist, tri_wtime, tri_max) = (
                diff, vdx, vdz, zro, ovr, oang, dst, wt, mx
            )
        else:
            better = diff < tri_min_diff
            tri_dx = jnp.where(better, vdx, tri_dx)
            tri_dz = jnp.where(better, vdz, tri_dz)
            tri_zero = jnp.where(better, zro, tri_zero)
            tri_ovr = jnp.where(better, ovr, tri_ovr)
            tri_oang = jnp.where(better, oang, tri_oang)
            tri_dist = jnp.where(better, dst, tri_dist)
            tri_wtime = jnp.where(better, wt, tri_wtime)
            tri_max = jnp.where(better, mx, tri_max)
            tri_min_diff = jnp.where(better, diff, tri_min_diff)
    tri_any = tri_min_diff < _BIG_DIFF

    # ---- combine (Anis_TTF_rays.py:1146, :1202-1262) -----------------------
    on_boundary = edges["left"] | edges["right"] | edges["top"] | edges["bottom"]
    try_tri = (~sq_any) | on_boundary
    carry_diff = jnp.where(sq_any, sq_min_diff, 1.0e6)
    use_tri = try_tri & tri_any & (tri_min_diff < carry_diff)

    sel_dx = jnp.where(use_tri, tri_dx, sq_dx)
    sel_dz = jnp.where(use_tri, tri_dz, sq_dz)
    sel_zero = jnp.where(use_tri, tri_zero, sq_zero)
    sel_ovr = use_tri & tri_ovr
    sel_oang = jnp.where(use_tri, tri_oang, 0.0)
    # The ONE arctan of the update (was one per stencil): same formula /
    # operand values as _wavefront_angle_dist, so angles are bit-identical.
    dx_safe = jnp.where(sel_zero, 1.0, sel_dx)
    angle = jnp.mod(jnp.degrees(_ATAN[0](sel_dz / dx_safe)) + 90.0, 180.0)
    angle = jnp.where(sel_zero, 0.0, angle)
    angle = jnp.where(sel_ovr, sel_oang, angle)
    dist = jnp.where(use_tri, tri_dist, jnp.where(sq_any, sq_dist, -1.0))
    wtime = jnp.where(use_tri, tri_wtime, sq_wtime)
    inputs_max = jnp.where(use_tri, tri_max, sq_max)
    return angle, dist, wtime, inputs_max


def _quad_solve(a, b, c, tref, tdiv, clamp_disc):
    rd1 = b * b - 4.0 * a * c
    ok = rd1 > 0.0
    if clamp_disc:
        rd1 = jnp.maximum(rd1, 0.0)
        ok = jnp.full(rd1.shape, True)
    rd1 = jnp.maximum(rd1, 0.0)
    t = (tref + (-b + jnp.sqrt(rd1)) / (2.0 * a)) / tdiv
    return t, ok


def _axis_or_diag_family(nbr, known, slown, h, quadrants, family, causal=False):
    """Shared structure of the fouds18_A axis family (h = dnx,
    Anis_TTF_rays.py:319-459) and diagonal family (h = sqrt(2) dnx,
    Anis_TTF_rays.py:506-691).  ``quadrants`` is a list of (J, K) unit
    offsets; J2 = 2J, K2 = 2K.  Returns the family minimum (INF if none).

    Family differences replicated exactly:
    * axis clamps a negative discriminant to 0 (:451-452); the diagonal
      family skips the candidate instead (:684);
    * the two-first-order branch constant: -(h s)^2 for axis (:418) vs
      -(4/9)(h s)^2 for diagonal (:635);
    * tdiv quirks (:389-395 vs :606, :435 vs :659).
    """
    clamp_disc = family == "axis"
    best = None
    for (J, K), quad_inb in quadrants:
        J2 = (2 * J[0], 2 * J[1])
        K2 = (2 * K[0], 2 * K[1])
        tJ, tJ2, tK, tK2 = nbr[J], nbr[J2], nbr[K], nbr[K2]
        kJ, kJ2, kK, kK2 = known[J], known[J2], known[K], known[K2]
        swj = kJ2 & kJ & (tJ >= tJ2)
        swk = kK2 & kK & (tK >= tK2)
        e1 = 4.0 * tJ - tJ2
        e2 = 4.0 * tK - tK2
        hs = h * slown

        # Priority-ordered branch table (exactly one fires per point).
        b_1 = swj & swk
        b_2 = swj & ~swk & kK
        b_3 = swj & ~swk & ~kK
        b_4 = ~swj & kJ & swk
        b_5 = ~swj & kJ & ~swk & kK
        b_6 = ~swj & kJ & ~swk & ~kK
        b_7 = ~swj & ~kJ & swk
        b_8 = ~swj & ~kJ & ~swk & kK
        any_b = b_1 | b_2 | b_3 | b_4 | b_5 | b_6 | b_7 | b_8

        a = jnp.where(
            b_1 | b_2 | b_4, 18.0, jnp.where(b_5, 2.0, 1.0)
        )
        b = jnp.where(
            b_1,
            -6.0 * (e1 + e2),
            jnp.where(
                b_2,
                -6.0 * (3.0 * tK + e1),
                jnp.where(
                    b_4,
                    -6.0 * (3.0 * tJ + e2),
                    jnp.where(b_5, -2.0 * (tK + tJ), 0.0),
                ),
            ),
        )
        c = jnp.where(
            b_1,
            e1 * e1 + e2 * e2 - 4.0 * (2.0 * hs) ** 2,
            jnp.where(
                b_2,
                (3.0 * tK) ** 2 + e1 * e1 - 4.0 * (2.0 * hs) ** 2,
                jnp.where(
                    b_3,
                    -((2.0 * hs) ** 2),
                    jnp.where(
                        b_4,
                        (3.0 * tJ) ** 2 + e2 * e2 - 12.0 * hs * hs,
                        jnp.where(
                            b_5,
                            tK * tK + tJ * tJ
                            - (hs * hs if clamp_disc else (4.0 / 9.0) * hs * hs),
                            jnp.where(
                                b_6,
                                -((tJ + hs) ** 2),
                                jnp.where(
                                    b_7,
                                    -((2.0 * hs) ** 2),
                                    -((tK + hs) ** 2),
                                ),
                            ),
                        ),
                    ),
                ),
            ),
        )
        tref = jnp.where(
            b_3, e1, jnp.where(b_7, e2, 0.0)
        )
        # Quirk parity: the axis family's horizontal-2nd-order-only branch has
        # tdiv overwritten back to 1.0 (Anis_TTF_rays.py:389-395); the
        # vertical one keeps 3.0 (:435); the diagonal family keeps 3.0 for
        # both (:606, :659).
        if clamp_disc:  # axis family
            tdiv = jnp.where(b_7, 3.0, 1.0)
        else:  # diagonal family
            tdiv = jnp.where(b_3 | b_7, 3.0, 1.0)
        t, ok = _quad_solve(a, b, c, tref, tdiv, clamp_disc)
        if causal:
            # Causality filter for the iterative driver: a candidate that
            # undercuts the values it was built from reflects a not-yet-
            # converged neighbourhood, never the final solution (swj/swk
            # already force tJ2 <= tJ, tK2 <= tK, so tJ/tK dominate).
            uses_j = b_1 | b_2 | b_3 | b_4 | b_5 | b_6
            uses_k = b_1 | b_2 | b_4 | b_5 | b_7 | b_8
            imax = jnp.maximum(
                jnp.where(uses_j, tJ, -INF), jnp.where(uses_k, tK, -INF)
            )
            ok = ok & (t >= imax)
        cand = jnp.where(any_b & ok & quad_inb, t, INF)
        best = cand if best is None else jnp.minimum(best, cand)
    return best


def _knight_family(nbr, known, inb, slown, dnx, cycle, causal=False):
    """fouds18_A knight's-move family (Anis_TTF_rays.py:736-795, :836-893).
    A pair only counts when both of its points are inside the grid
    (the reference's nested bounds tests at :748-751)."""
    u = SQRT5 * dnx
    best = None
    for l in range(4):
        p = cycle[l]
        q = cycle[(l + 1) % 4]
        tp, tq = nbr[p], nbr[q]
        pair_inb = inb[p] & inb[q]
        kp, kq = known[p] & pair_inb, known[q] & pair_inb
        us = u * slown
        both = kp & kq
        a = jnp.where(both, 2.0, 1.0)
        b = jnp.where(both, -2.0 * (tq + tp), 0.0)
        c = jnp.where(
            both,
            tq * tq + tp * tp - 2.0 * us * us,
            -(us * us),
        )
        tref = jnp.where(both, 0.0, jnp.where(kp, tp, tq))
        rd1 = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        t = tref + (-b + jnp.sqrt(rd1)) / (2.0 * a)
        ok = kp | kq
        if causal:
            imax = jnp.maximum(
                jnp.where(kp, tp, -INF), jnp.where(kq, tq, -INF)
            )
            ok = ok & (t >= imax)
        cand = jnp.where(ok, t, INF)
        best = cand if best is None else jnp.minimum(best, cand)
    return best


def _fouds_candidate(nbr, known, inb, fbs, tt_center, dnx, causal=False):
    """Vectorised fouds18_A: min over the four stencil families, then min
    with the existing value (Anis_TTF_rays.py:898-899).  A quadrant only
    participates when both of its primary points are inside the grid
    (reference bounds tests at :320, :339, :511, :539)."""
    axis_quads = [
        (((0, jx), (kz, 0)), inb[(0, jx)] & inb[(kz, 0)])
        for jx in (-1, 1)
        for kz in (-1, 1)
    ]
    travm = _axis_or_diag_family(
        nbr, known, fbs[0], dnx, axis_quads, family="axis", causal=causal
    )
    # diagonal quadrants: d in {(+1,-1), (-1,+1)}, skew in {(-1,-1), (+1,+1)}
    diag_quads = [
        ((d, s), inb[d] & inb[s])
        for d in ((1, -1), (-1, 1))
        for s in ((-1, -1), (1, 1))
    ]
    travmd = _axis_or_diag_family(
        nbr, known, fbs[1], SQRT2 * dnx, diag_quads, family="diag", causal=causal
    )
    out = jnp.minimum(travm, travmd)
    out = jnp.minimum(
        out, _knight_family(nbr, known, inb, fbs[2], dnx, _KNIGHT_A, causal)
    )
    out = jnp.minimum(
        out, _knight_family(nbr, known, inb, fbs[3], dnx, _KNIGHT_B, causal)
    )
    return jnp.minimum(out, tt_center)


def local_update(
    nbr: Dict[Tuple[int, int], jnp.ndarray],
    known: Dict[Tuple[int, int], jnp.ndarray],
    inb: Dict[Tuple[int, int], jnp.ndarray],
    tt_center: jnp.ndarray,
    veln,
    velpn,
    vel_map,
    stif,
    fbs,
    edges,
    model: "gridlib.Model",
    dnx: float,
    causal: bool = False,
    vel_fn=None,
    use_ali: bool = True,
    use_fd: bool = True,
):
    """One local solve at every point of a block.

    Returns the new travel-time estimate (INF where no stencil of either
    solver applies).  Matches the reference control flow: ALI update first;
    where it reports no usable stencil (dist == -1) fall back to the
    multi-stencil FD estimate.

    ``causal=True`` additionally rejects candidates smaller than the
    largest stencil value they were computed from -- required for stable
    convergence of the parallel iterative driver (the reference's heap
    ordering provides this implicitly); ``causal=False`` is the exact
    reference operator used for parity tests and polish passes.

    ``vel_fn``: optional ``eff_angle_deg -> phase velocity`` override used
    by the Pallas sweep kernel (folded per-cell Christoffel coefficients
    instead of the Model dispatch).

    ``use_ali=False`` skips the ALI candidate and returns the pure
    multi-stencil FD estimate.  The FD quadratic updates are monotone
    upwind (inputs above the true solution can only produce outputs above
    it), unlike the ALI wavefront *interpolation*, whose extrapolated
    line can undershoot when fed partial-knowledge transients -- the
    parallel-in-block phase-1 envelope (ops/sweep.gs_pass ``inner``)
    relies on this to stay min-lock-safe.
    """
    if not (use_ali or use_fd):
        raise ValueError("local_update needs at least one of use_ali/use_fd")
    if use_fd:
        fouds_val = _fouds_candidate(nbr, known, inb, fbs, tt_center, dnx,
                                     causal)
    else:
        # ``use_fd=False`` (replace-polish fast path): skip the FD fallback
        # entirely -- it is ~75% of the branchless update's cost
        # (bench_data/FINDINGS_r2.md) yet on a near-converged field the ALI
        # candidate is valid almost everywhere.  Where it is not, INF makes
        # the replace accumulation keep the phase-1 value (which WAS
        # computed with the fallback), so FD-determined points keep their
        # envelope values instead of degrading.
        fouds_val = jnp.full_like(tt_center, INF)
    if not use_ali:
        return fouds_val
    angle, dist, wtime, imax = _ali_candidate(nbr, known, edges)
    eff = jnp.mod(veln - angle, 180.0)
    if vel_fn is not None:
        vel = vel_fn(eff)
    else:
        vel = gridlib.phase_velocity_at(
            model, eff, velpn=velpn, vel_map=vel_map, stif=stif
        )
    ali_val = wtime + dist * dnx / vel
    ali_ok = dist >= 0.0
    if causal:
        ali_ok = ali_ok & (ali_val >= imax)
    return jnp.where(ali_ok, ali_val, fouds_val)


def neighbors_from_padded(tt_pad, Z, X):
    """Build the 24 neighbour views from a (+2 INF)-padded array whose last
    two dims are (Z + 4, X + 4).  Leading batch dims pass through."""
    nbr = {}
    known = {}
    for (dz, dx) in OFFSETS:
        v = tt_pad[..., 2 + dz : 2 + dz + Z, 2 + dx : 2 + dx + X]
        nbr[(dz, dx)] = v
        known[(dz, dx)] = v < INF * 0.5
    return nbr, known


def edge_masks(Z, X, dtype=bool):
    """Boundary masks for a full (Z, X) block."""
    iz = jnp.arange(Z)[:, None]
    ix = jnp.arange(X)[None, :]
    return dict(
        top=jnp.broadcast_to(iz == 0, (Z, X)),
        bottom=jnp.broadcast_to(iz == Z - 1, (Z, X)),
        left=jnp.broadcast_to(ix == 0, (Z, X)),
        right=jnp.broadcast_to(ix == X - 1, (Z, X)),
    )


def inbounds_masks(Z, X):
    """For each offset, whether the neighbour coordinate stays inside a
    (Z, X) grid, per target point."""
    iz = jnp.arange(Z)[:, None]
    ix = jnp.arange(X)[None, :]
    out = {}
    for (dz, dx) in OFFSETS:
        ok_z = (iz + dz >= 0) & (iz + dz <= Z - 1)
        ok_x = (ix + dx >= 0) & (ix + dx <= X - 1)
        out[(dz, dx)] = jnp.broadcast_to(ok_z & ok_x, (Z, X))
    return out


def full_grid_update(tt, model: gridlib.Model, fixed_mask, causal=False):
    """One Jacobi pass of the local update over the whole grid.

    ``tt`` is (..., Z, X) with INF at unknown points; ``fixed_mask`` marks
    clamped points (source seeds / injected telescoping values)."""
    Z, X = tt.shape[-2], tt.shape[-1]
    pad = [(0, 0)] * (tt.ndim - 2) + [(2, 2), (2, 2)]
    tt_pad = jnp.pad(tt, pad, constant_values=INF)
    nbr, known = neighbors_from_padded(tt_pad, Z, X)
    edges = edge_masks(Z, X)
    inb = inbounds_masks(Z, X)
    new = local_update(
        nbr,
        known,
        inb,
        tt,
        model.veln,
        model.velpn,
        model.vel_map,
        model.stif,
        model.fallback_slowness,
        edges,
        model,
        model.dnx,
        causal,
    )
    return jnp.where(fixed_mask, tt, new)
