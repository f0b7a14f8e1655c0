"""Accuracy-preset goldens: demonstrate the BASELINE.md <= 1e-3 relative
time-field bound vs the reference heap march (run as the pure-Python
oracle), and pin honest envelopes where the oracle itself is not a
1e-3-grade target.

What limits pointwise parity (bench_data/diag_accuracy_r3*.py, round 3):
the reference's stage-3 march stops at the first pop ON the patch
border (Anis_TTF_rays.py:1972-1975, 1993-1994); every same-ring cell
that was still "close" keeps its *partial-knowledge heap candidate* --
measured +1.7e-3 above the reference's own converged patch values at
r=13 -- and those values are copied down and largely survive the coarse
final march (their alive neighbours are not on the heap, so nothing
re-updates them before they pop).  A converged solver cannot and should
not reproduce heap-candidate history at ulp fidelity, so:

* on isotropic media the deviation is CONFINED to the stop-ring annulus
  (d in [12, 16] for the reference's half=13 window): excluding it, the
  accuracy preset meets the BASELINE <= 1e-3 L-inf bound (measured
  9.3e-4), with full-field mean ~2.4e-4;
* on anisotropic media the ring artifact advects outward along
  characteristics, so the full-field L-inf envelope is wider; the mean
  stays at the few-1e-4 level and the frozen disk (d < 12) floors at
  the patch-to-patch parity level (~2.4e-3 smooth / 4.1e-3 random
  orientations: the heap's partial-knowledge patch candidates vs our
  converged patch sweeps).
"""

import numpy as np

import jax.numpy as jnp

from alifmm_tpu import grid as gridlib
from alifmm_tpu import materials as mats
from alifmm_tpu import solver

from ref_shim import load_reference

ref = load_reference()

Z, X = 41, 45
DNX = 1e-3
SZ, SX = 20, 22


def _run_reference_travel(veln, velpn, vel_map, g_tab, p_tab):
    nsts = np.zeros((Z, X), dtype=int)
    btg = np.zeros((round(0.5 * Z * X), 2), dtype=int)
    ttn = np.zeros((Z, X))
    return ref.travel(
        SX * DNX, SZ * DNX, nsts, btg, 0, ttn, veln, velpn.astype(int),
        vel_map, None, g_tab, p_tab, 0, 0, DNX, DNX, X, Z,
    )


def _solve_accuracy(model):
    return np.asarray(
        solver.solve_ttf(
            model, np.array([SX * DNX]), np.array([SZ * DNX]), 1,
            solver.SolveConfig.accuracy(),
        )
    )[0]


def _rel_and_rings(got, want):
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    d = np.hypot(zz - SZ, xx - SX)
    mask = want > 0
    rel = np.where(mask, np.abs(got - want) / np.where(mask, want, 1), 0)
    ring = (d >= 12.0) & (d <= 16.0)
    return rel, ring, mask, d


def test_accuracy_mode_isotropic_baseline_linf():
    veln = np.zeros((Z, X))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = 3000.0 * np.ones((Z, X))
    tab = np.ones((361, 2))
    tab[:, 0] = np.arange(361)
    want = _run_reference_travel(veln, velpn, vel_map, tab, tab)
    model = gridlib.make_model(
        veln, velpn, vel_map, None, tab, tab, DNX, dtype=jnp.float64
    )
    got = _solve_accuracy(model)
    rel, ring, mask, d = _rel_and_rings(got, want)
    # the BASELINE bound, demonstrated wherever the oracle itself is
    # self-consistent (everything but the stop-ring annulus)
    assert rel[~ring].max() <= 1e-3, rel[~ring].max()
    # the ring's heap-candidate artifact is bounded and small
    assert rel.max() < 2.5e-3, rel.max()
    assert rel[mask].mean() < 3.5e-4, rel[mask].mean()


def test_accuracy_mode_smooth_anisotropic():
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.stack([np.arange(361.0),
                  mats.generate_group_vel_curve(c22, c23, c33, c44, rho)], 1)
    p = np.stack([np.arange(361.0),
                  mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)], 1)
    zz, xx = np.meshgrid(np.arange(Z), np.arange(X), indexing="ij")
    veln = np.round((45 + 30 * np.sin(zz / 8.0) * np.cos(xx / 7.0)) % 180)
    velpn = np.ones((Z, X), dtype=int)
    vel_map = np.ones((Z, X))
    want = _run_reference_travel(veln, velpn, vel_map, g, p)
    model = gridlib.make_model(
        veln, velpn, vel_map, None, g, p, DNX, dtype=jnp.float64
    )
    got = _solve_accuracy(model)
    rel, ring, mask, d = _rel_and_rings(got, want)
    # frozen disk: patch-to-patch parity (heap vs sweep at 3x partial
    # knowledge) floors at ~2.4e-3 on anisotropic media
    assert rel[d < 12.0].max() <= 3.5e-3, rel[d < 12.0].max()
    # ring + its outward wake (measured 7.1e-3 L-inf, mean 2.6e-4)
    assert rel.max() < 1.2e-2, rel.max()
    assert rel[mask].mean() < 4e-4, rel[mask].mean()


def test_accuracy_mode_random_anisotropic_tracked():
    """Adversarial medium: per-cell random orientation (rounded degrees).
    Tracked envelope, not a 1e-3 claim -- the stop-ring wake dominates
    (measured L-inf 1.1e-2 at d=12.6, mean 5.0e-4, frozen disk clean)."""
    rng = np.random.default_rng(7)
    c22, c23, c33, c44, rho = 263e9, 145e9, 216e9, 129e9, 7800
    g = np.stack([np.arange(361.0),
                  mats.generate_group_vel_curve(c22, c23, c33, c44, rho)], 1)
    p = np.stack([np.arange(361.0),
                  mats.generate_phase_vel_curve(c22, c23, c33, c44, rho)], 1)
    veln = np.round(rng.uniform(0, 180, (Z, X)))
    velpn = np.ones((Z, X), dtype=int)
    vel_map = np.ones((Z, X))
    want = _run_reference_travel(veln, velpn, vel_map, g, p)
    model = gridlib.make_model(
        veln, velpn, vel_map, None, g, p, DNX, dtype=jnp.float64
    )
    got = _solve_accuracy(model)
    rel, ring, mask, d = _rel_and_rings(got, want)
    assert rel[d < 12.0].max() <= 6e-3, rel[d < 12.0].max()
    assert rel.max() < 2e-2, rel.max()
    assert rel[mask].mean() < 8e-4, rel[mask].mean()
