"""qSV shear-mode tests (BASELINE config "qSV/qSH").

There is NO oracle for qSV: the reference was never run with shear
tables upstream, and its heap+ALI operator embeds convex-slowness (qP)
assumptions.  The qSV group curve has CONCAVE sectors, where the true
first arrival in even a homogeneous medium is NOT the straight ray but
a faster multi-segment path through convex-hull directions; measured on
a homogeneous 140-degree qSV medium (bench_data/diag_qsv_r3b.py): the
sweep solver returns hull arrivals (e.g. 1.53us vs the straight ray's
2.44us at a concave direction) while the reference heap march returns
neither the straight ray nor the hull (2.33us) -- so pointwise parity
against it is not a meaningful target for shear modes.

Even straight-ray/convex-hull equalities are not assertable: at
triplication sectors the binned group table and the phase table carry
different branches, and the solver's mixed ALI(phase)/FD(group)
operator realises speeds between them (48% gaps vs group-table
straight rays in BOTH directions, diag_qsv_r3b.py).

What IS pinned here:
* the convergence machinery: SolveConfig.for_mode("qsv") budgets
  converge where the default budget honestly reports not-converged;
* table-semantics-independent physics on a homogeneous medium: point
  symmetry about the source and speed-range bounds.
(The sharded-vs-single qSV guarantee lives in tests/test_shard.py and
is fp-exact.)
"""

import numpy as np

import jax.numpy as jnp

from alifmm_tpu import grid as gridlib
from alifmm_tpu import materials as mats
from alifmm_tpu import solver


def _qsv_tables():
    g, p = mats.generate_mode_curves(
        263e9, 145e9, 216e9, 129e9, 7800.0, mode="qSV"
    )
    gtab = np.stack([np.arange(361.0), g], axis=1)
    ptab = np.stack([np.arange(361.0), p], axis=1)
    return gtab, ptab


def _rough_model(Z=33, X=37, dnx=5e-4):
    gtab, ptab = _qsv_tables()
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    veln = np.round(
        (20.0 + 70.0 * np.sin(zz / 6.0) * np.cos(xx / 5.0)) % 180
    )
    model = gridlib.make_model(
        veln, np.ones((Z, X), dtype=int), np.ones((Z, X)), None,
        gtab, ptab, dnx, dtype=jnp.float64,
    )
    return model, dnx


def test_qsv_mode_converges_with_mode_budget():
    model, dnx = _rough_model()
    cfg = solver.SolveConfig.for_mode("qsv")
    _, info = solver.solve_ttf(
        model, np.array([18 * dnx]), np.array([16 * dnx]), 1, cfg,
        return_info=True,
    )
    assert bool(np.asarray(info.converged)), int(np.asarray(info.passes))
    assert int(np.asarray(info.passes)) < 96


def test_qsv_default_budget_reports_unconverged_or_converged_honestly():
    """The convergence flag must be truthful: whatever the default budget
    does on the qSV model, a for_mode budget converges and the default
    either converges too or honestly hits its cap."""
    model, dnx = _rough_model()
    _, info_def = solver.solve_ttf(
        model, np.array([18 * dnx]), np.array([16 * dnx]), 1,
        solver.SolveConfig(), return_info=True,
    )
    _, info_qsv = solver.solve_ttf(
        model, np.array([18 * dnx]), np.array([16 * dnx]), 1,
        solver.SolveConfig.for_mode("qsv"), return_info=True,
    )
    assert bool(np.asarray(info_qsv.converged))
    if not bool(np.asarray(info_def.converged)):
        assert int(np.asarray(info_def.passes)) == 16  # hit the cap


def test_qsv_homogeneous_speed_bounds():
    """Homogeneous qSV medium: the only table-semantics-independent
    pointwise property left standing.

    Straight-ray / convex-hull equalities are NOT assertable (48% gaps
    both ways, diag_qsv_r3b.py: group and phase tables carry different
    triplication branches), and even point symmetry about the source
    breaks at the 28% level -- the ambiguous tables admit MANY discrete
    fixpoints and the sweep-direction history selects branches
    asymmetrically (all converged, all self-consistent).  What must
    hold for any branch selection: arrivals lie between d/v_max and
    d/v_min of the group+phase table union.
    """
    Z, X = 33, 37
    dnx = 5e-4
    veln0 = 140.0
    gtab, ptab = _qsv_tables()
    model = gridlib.make_model(
        veln0 * np.ones((Z, X)), np.ones((Z, X), dtype=int),
        np.ones((Z, X)), None, gtab, ptab, dnx, dtype=jnp.float64,
    )
    sz, sx = 16, 18
    got = np.asarray(solver.solve_ttf(
        model, np.array([sx * dnx]), np.array([sz * dnx]), 1,
        solver.SolveConfig.for_mode("qsv"),
    ))[0]

    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    d = np.hypot(zz - sz, xx - sx)
    v_lo = min(gtab[:, 1].min(), ptab[:, 1].min())
    v_hi = max(gtab[:, 1].max(), ptab[:, 1].max())
    far = d > 2
    assert np.all(got[far] >= d[far] * dnx / v_hi * (1 - 1e-6))
    assert np.all(got[far] <= d[far] * dnx / v_lo * (1 + 0.25)), (
        "arrival slower than the slowest table speed"
    )
