"""Physics-layer tests: Christoffel velocities and velocity tables against
the reference's closed forms (executed via the pure-Python oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from alifmm_tpu import materials as mats

from ref_shim import load_reference

ref = load_reference()

# austenitic-steel-like stiffnesses in MPa + density (reference convention
# for the runtime solve, Anis_TTF_rays.py:269)
C22, C23, C33, C44, RHO = 263000, 145000, 216000, 129000, 7800


def test_group_velocity_matches_reference_scalar():
    # Avoid sampling exactly on the 0.01-degree near-axis guard: jnp.mod and
    # Python % can disagree in the last ulp right at the threshold.
    angles = np.concatenate(
        [np.linspace(0.0, 179.95, 777), [0.0, 45.0, 90.0, 135.0, 89.995, 0.005]]
    )
    want = np.array(
        [ref.group_vel(a, C22, C23, C33, C44, RHO, 1.0) for a in angles]
    )
    got = np.asarray(
        mats.group_velocity_christoffel(
            jnp.asarray(angles, jnp.float64), C22, C23, C33, C44, RHO, 1.0
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_group_velocity_periodicity():
    a = jnp.linspace(0.0, 179.0, 180, dtype=jnp.float64)
    v1 = mats.group_velocity_christoffel(a, C22, C23, C33, C44, RHO)
    v2 = mats.group_velocity_christoffel(a + 180.0, C22, C23, C33, C44, RHO)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-12)


def test_phase_velocity_isotropic():
    # isotropic: c22 == c33, c23 = c22 - 2 c44  =>  v = sqrt(c22 / rho)
    c22 = 250000.0
    c44 = 80000.0
    c23 = c22 - 2 * c44
    a = jnp.linspace(0.0, 179.0, 180, dtype=jnp.float64)
    v = np.asarray(mats.phase_velocity_christoffel(a, c22, c23, c22, c44, RHO))
    np.testing.assert_allclose(v, 1000.0 * np.sqrt(c22 / RHO), rtol=1e-10)


def test_generate_curves_match_reference_class():
    cls = ref.ALI_FMM(
        np.zeros((4, 4)),
        np.ones((4, 4), dtype=int),
        np.ones((4, 4)),
        np.array([0.0]),
        np.array([0.0]),
    )
    # stiffness in Pa for the curve generators (Anis_TTF_rays.py:4116-4124)
    args = (C22 * 1e6, C23 * 1e6, C33 * 1e6, C44 * 1e6, RHO)
    want_g = cls.generate_group_vel(*args, plot=False)
    want_p = cls.generate_phase_vel(*args, plot=False)
    got_g = mats.generate_group_vel_curve(*args)
    got_p = mats.generate_phase_vel_curve(*args)
    np.testing.assert_allclose(got_g, want_g, rtol=1e-12)
    np.testing.assert_allclose(got_p, want_p, rtol=1e-12)


def test_phase_curve_consistent_with_pointwise():
    curve = mats.generate_phase_vel_curve(
        C22 * 1e6, C23 * 1e6, C33 * 1e6, C44 * 1e6, RHO
    )
    # MPa closed form with 1000x factor must agree with the Pa curve
    a = jnp.arange(1.0, 180.0, dtype=jnp.float64)
    v = np.asarray(mats.phase_velocity_christoffel(a, C22, C23, C33, C44, RHO))
    np.testing.assert_allclose(v, curve[1:180], rtol=1e-10)


def test_interp_table_matches_reference_lookup():
    rng = np.random.default_rng(0)
    tab = np.ones((361, 3))
    tab[:, 0] = np.arange(361)
    tab[:, 1] = 3000 + 500 * np.sin(np.radians(2 * np.arange(361)))
    tab[:, 2] = 4000 + 300 * np.cos(np.radians(2 * np.arange(361)))
    eff = rng.uniform(0, 179.999, 64)
    m = rng.integers(1, 3, 64)
    vm = rng.uniform(0.5, 2.0, 64)
    want = np.empty(64)
    for i in range(64):
        a1 = int(np.floor(eff[i]))
        a2 = (a1 + 1) % 180
        w = eff[i] - a1
        want[i] = vm[i] * ((1 - w) * tab[a1, m[i]] + w * tab[a2, m[i]])
    got = np.asarray(
        mats.interp_table(
            jnp.asarray(tab), jnp.asarray(eff), jnp.asarray(m), jnp.asarray(vm)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_mode_curves():
    """qSV/qSH curves: isotropic reduction and qP consistency."""
    # isotropic medium: qP = sqrt(c22/rho), qSV = qSH = sqrt(c44/rho)
    c22 = 250e9
    c44 = 80e9
    c23 = c22 - 2 * c44
    rho = 7800.0
    g_p, p_p = mats.generate_mode_curves(c22, c23, c22, c44, rho, mode="qP")
    g_sv, p_sv = mats.generate_mode_curves(c22, c23, c22, c44, rho, mode="qSV")
    g_sh, p_sh = mats.generate_mode_curves(c22, c23, c22, c44, rho, mode="qSH")
    np.testing.assert_allclose(g_p[:181], np.sqrt(c22 / rho), rtol=1e-6)
    np.testing.assert_allclose(g_sv[:181], np.sqrt(c44 / rho), rtol=1e-6)
    np.testing.assert_allclose(g_sh[:181], np.sqrt(c44 / rho), rtol=1e-6)
    # anisotropic qP phase curve must match the reference generator (the
    # convexified-slowness round trip is an involution on convex modes;
    # residual is dense-sampling error ~2e-8)
    want = mats.generate_phase_vel_curve(
        263e9, 145e9, 216e9, 129e9, 7800
    )
    _, p = mats.generate_mode_curves(263e9, 145e9, 216e9, 129e9, 7800, mode="qP")
    np.testing.assert_allclose(p[1:180], want[1:180], rtol=1e-6)
    # qP group curve (plane-wave envelope = true hull) vs the reference
    # closed form: the reference's phase-from-group inversion is itself
    # ~0.5% approximate (one-sided, FINDINGS_r4.md), so parity is 6e-3
    g, _ = mats.generate_mode_curves(263e9, 145e9, 216e9, 129e9, 7800, mode="qP")
    want_g = mats.generate_group_vel_curve(263e9, 145e9, 216e9, 129e9, 7800)
    np.testing.assert_allclose(g[:181], want_g[:181], rtol=6e-3)
    # and one-sided: the closed form never undershoots the true dual
    assert np.all(want_g[:181] >= g[:181] * (1 - 1e-6))


def test_slowness_derivative_matches_reference():
    want = np.array(
        [
            ref.slown_d_slown_stif(a, C22, C23, C33, C44, RHO, 1.0)
            for a in [0.0, 10.0, 30.0, 44.0, 46.0, 80.0, 90.0, 120.0, 170.0]
        ]
    )
    got = np.asarray(
        mats.slowness_derivative(
            jnp.asarray([0.0, 10.0, 30.0, 44.0, 46.0, 80.0, 90.0, 120.0, 170.0],
                        jnp.float64),
            C22, C23, C33, C44, RHO,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)
