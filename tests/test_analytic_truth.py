"""Absolute accuracy vs closed-form truths -- NO oracle in the loop.

On homogeneous media the first-arrival field is exact:
    t(P) = dnx * |P - S| / v_group((veln - ray_angle) % 180)
(straight rays; the solver's own seed formula extended to the grid,
solver._analytic_seed / Anis_TTF_rays.py:1546-1590).  These tests pin
the solver's ABSOLUTE discretisation error, complementing the
oracle-parity suite (tests/test_accuracy_mode.py).  All bounds are
measured values (bench_data/diag_analytic_r4.py, round 4) + 20-30%
margin.

What the measurements established:

* **The error is scale-stable, not growing.**  The relative-error L-inf
  SATURATES at a fixed cell radius and is independent of domain size:
  isotropic 1.899e-2 at d~21 for N=41/81/161 identically; homogeneous
  anisotropic qP (veln=30) 3.605e-2 at d~20.6, likewise N-independent.
* **The error lives at the telescoping hand-off radii.**  Each
  refinement stage hands off to a 3x-coarser march whose first cells
  see the largest wavefront curvature (kappa*h ~ h/r); the hand-offs at
  r~3/9/21 cells each inject ~1-2% relative error which then dilutes
  outward (mean falls as the domain grows: 1.14e-2 at N=81 ->
  0.93e-2 at N=161).  This is the METHOD's floor, shared with the
  reference: the oracle-parity suite pins solver==reference to <=1e-3
  (isotropic, outside the stop ring), so the reference's own absolute
  error equals these envelopes to within 1e-3 (its stage-3 values
  measured +1.9% vs analytic at r=18, SolveConfig.stage3_half notes).
* **Widening the frozen window buys absolute accuracy.**
  stage3_half=25 cuts the saturated peak 1.899e-2 -> 1.492e-2 and the
  mean 1.144e-2 -> 0.751e-2, moving the binding peak inward to the
  stage-2->3 hand-off (d~9) -- proof the error is the telescoping
  policy, not the sweep solver (documented trade: better truth, worse
  oracle parity).
* **The fine-grid path replicates the reference's seed-sign quirk.**
  travel_finer_grid seeds with eff = veln + angle (Anis_TTF_rays.py:
  2234) where the coarse path uses veln - angle (:1558); the frozen
  near-source disk therefore matches the MIRRORED-angle truth (measured
  mean 3.2e-3 inside 6 fine cells) while the march beyond converges to
  the physical field (d>=27 fine cells: 6.0e-2 -> 3.9e-2 L-inf,
  decaying outward).
"""

import numpy as np

import jax.numpy as jnp

from alifmm_tpu import grid as gridlib
from alifmm_tpu import materials as mats
from alifmm_tpu import solver

DNX = 1e-3


def _aniso_tables():
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.stack([np.arange(361.0),
                  mats.generate_group_vel_curve(c22, c23, c33, c44, rho)], 1)
    p = np.stack([np.arange(361.0),
                  mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)], 1)
    return g, p


def _iso_table():
    t = np.ones((361, 2))
    t[:, 0] = np.arange(361)
    return t


def analytic_field(N, sz, sx, veln_deg, g_tab, subgrid=1, vel=1.0,
                   sign=-1.0):
    """Exact homogeneous-medium field in solve_ttf's output units.
    ``sign``: -1 is the physical coarse-path convention (veln - angle);
    +1 the fine-path seed quirk (veln + angle)."""
    Nf = subgrid * (N - 1) + 1
    szf, sxf = subgrid * sz, subgrid * sx
    zz, xx = np.meshgrid(np.arange(Nf), np.arange(Nf), indexing="ij")
    dz = zz - szf
    dx = xx - sxf
    ang = np.where(dx == 0, 90.0,
                   np.degrees(np.arctan(dz / np.where(dx == 0, 1, dx))))
    eff = np.mod(veln_deg + sign * ang, 180.0)
    lo = np.floor(eff).astype(int)
    frac = eff - lo
    v = g_tab[lo, 1] * (1 - frac) + g_tab[np.minimum(lo + 1, 360), 1] * frac
    # fine cells are DNX/subgrid wide (solve_ttf returns true seconds,
    # the reference's ttn/subgrid_size rescale, Anis_TTF_rays.py:2832)
    return DNX * np.hypot(dz, dx) / (v * vel) / subgrid


def _solve(N, veln_deg, g, p, cfg, subgrid=1, vel=1.0):
    sz = sx = N // 2
    model = gridlib.make_model(
        np.full((N, N), float(veln_deg)), np.ones((N, N), dtype=int),
        vel * np.ones((N, N)), None, g, p, DNX, dtype=jnp.float64,
    )
    got = np.asarray(
        solver.solve_ttf(model, np.array([sx * DNX]), np.array([sz * DNX]),
                         subgrid, cfg)
    )[0]
    Nf = subgrid * (N - 1) + 1
    zz, xx = np.meshgrid(np.arange(Nf), np.arange(Nf), indexing="ij")
    d = np.hypot(zz - subgrid * sz, xx - subgrid * sx) / subgrid
    return got, d, sz, sx


def _rel(got, want):
    mask = want > 0
    return np.where(mask, np.abs(got - want) / np.where(mask, want, 1),
                    0.0), mask


def test_isotropic_truth_scale_stable():
    """Constant v=3000, accuracy preset: saturated envelope (measured
    L-inf 1.899e-2 at d~21 for N=41 and N=81 alike).  The
    N-independence IS the assertion: doubling the domain must not grow
    the error, and the peak must sit in the coarse-march hand-off zone."""
    cfg = solver.SolveConfig.accuracy()
    iso = _iso_table()
    peaks = []
    for N in (41, 81):
        got, d, sz, sx = _solve(N, 0.0, iso, iso, cfg, vel=3000.0)
        rel, mask = _rel(got, analytic_field(N, sz, sx, 0.0, iso,
                                             vel=3000.0))
        assert rel.max() < 2.4e-2, (N, rel.max())
        assert rel[mask].mean() < 1.5e-2, (N, rel[mask].mean())
        dmax = d.ravel()[np.argmax(rel.ravel())]
        assert 13.0 < dmax < 30.0, (N, dmax)
        peaks.append(rel.max())
    assert abs(peaks[0] - peaks[1]) < 0.05 * peaks[1], peaks


def test_aniso_truth_homogeneous_qp():
    """Homogeneous anisotropic qP (t = d / v_group exactly): measured
    L-inf 3.605e-2 (veln=30), saturated scale-stably at d~20.6."""
    cfg = solver.SolveConfig.accuracy()
    g, p = _aniso_tables()
    peaks = []
    for N in (41, 81):
        got, d, sz, sx = _solve(N, 30.0, g, p, cfg)
        rel, mask = _rel(got, analytic_field(N, sz, sx, 30.0, g))
        assert rel.max() < 4.5e-2, (N, rel.max())
        assert rel[mask].mean() < 1.6e-2, (N, rel[mask].mean())
        peaks.append(rel.max())
    assert abs(peaks[0] - peaks[1]) < 0.05 * peaks[1], peaks


def test_stage3_half_improves_absolute_accuracy():
    """Widening the frozen 3x window (stage3_half=25) must cut the
    saturated peak (measured 1.899e-2 -> 1.492e-2) and the mean
    (1.144e-2 -> 0.751e-2), and move the binding peak inward to the
    stage-2->3 hand-off -- proving the saturated error is the
    telescoping-radius policy, not the sweep solver."""
    iso = _iso_table()
    got, d, sz, sx = _solve(81, 0.0, iso, iso,
                            solver.SolveConfig.accuracy(), vel=3000.0)
    want = analytic_field(81, sz, sx, 0.0, iso, vel=3000.0)
    rel_def, mask = _rel(got, want)
    got_w, d, sz, sx = _solve(81, 0.0, iso, iso,
                              solver.SolveConfig.accuracy(stage3_half=25),
                              vel=3000.0)
    rel_wide, _ = _rel(got_w, want)
    assert rel_wide.max() < 0.88 * rel_def.max(), (
        rel_wide.max(), rel_def.max())
    assert rel_wide[mask].mean() < 0.78 * rel_def[mask].mean(), (
        rel_wide[mask].mean(), rel_def[mask].mean())
    dmax = d.ravel()[np.argmax(rel_wide.ravel())]
    assert dmax < 13.0, dmax


def test_fine_grid_truth_and_seed_quirk():
    """The ray production path (subgrid_size=9) vs analytic truth on a
    homogeneous rotated medium (veln=30): the frozen near-source disk
    must match the MIRRORED-angle truth (the reference's
    travel_finer_grid seed quirk, Anis_TTF_rays.py:2234 -- measured
    mean 3.2e-3 / L-inf 2.2e-2 inside 6 fine cells), while the march
    converges to the PHYSICAL truth outward (measured L-inf 6.0e-2 at
    27-60 fine cells decaying to 3.9e-2 at 60-95)."""
    cfg = solver.SolveConfig.accuracy()
    g, p = _aniso_tables()
    got, d, sz, sx = _solve(21, 30.0, g, p, cfg, subgrid=9)
    t_phys = analytic_field(21, sz, sx, 30.0, g, subgrid=9, sign=-1.0)
    t_mirr = analytic_field(21, sz, sx, 30.0, g, subgrid=9, sign=+1.0)
    rel_p, mask = _rel(got, t_phys)
    rel_m, _ = _rel(got, t_mirr)
    d_fine = d * 9

    seed = (d_fine >= 0.5) & (d_fine < 6.0)
    assert rel_m[seed].mean() < 1e-2, rel_m[seed].mean()
    assert rel_m[seed].max() < 3e-2, rel_m[seed].max()
    # the seed region does NOT match the physical truth (the quirk is
    # real, not a tolerance artifact)
    assert rel_p[seed].max() > 0.1, rel_p[seed].max()

    far = (d_fine >= 27.0) & mask
    assert rel_p[far].max() < 7.5e-2, rel_p[far].max()
    assert rel_p[far].mean() < 2.5e-2, rel_p[far].mean()
    # full-field mean vs physical truth (measured 1.43e-2)
    assert rel_p[mask].mean() < 2e-2, rel_p[mask].mean()
