"""Weld-crop golden tests: our solver/tracer vs the reference executed on a
crop of the REAL weld model (curved weld boundary, rotating grain
orientation, transducer-row edge source).

Goldens are generated once by tests/make_weld_crop_goldens.py (pure-Python
oracle) and committed under tests/golden/ -- see that script for why the
weld cells use an equivalent table material (the un-jitted oracle cannot
run the stif_den path; vel_map == 1 at every weld cell makes the
substitution exact up to the reference's own 1-degree table sampling).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from alifmm_tpu import grid as gridlib
from alifmm_tpu import rays as rayslib
from alifmm_tpu import solver

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                      "weld_crop.npz")

REF = "/root/reference"


@pytest.fixture(scope="module")
def crop():
    d = np.load(GOLDEN)
    r0, r1 = d["rows"]
    c0, c1 = d["cols"]
    veln = np.load(os.path.join(REF, "weld_veln.npy"))[r0:r1, c0:c1]
    velpn_raw = np.load(os.path.join(REF, "weld_velpn.npy"))[r0:r1, c0:c1]
    vel_map = np.load(os.path.join(REF, "weld_vel_map.npy"))[r0:r1, c0:c1]
    velpn = np.where(velpn_raw == 0, 2, 1).astype(int)
    model = gridlib.make_model(
        veln, velpn, vel_map, None, d["group_tab"], d["phase_tab"],
        float(d["dnx"]), dtype=jnp.float64,
    )
    return d, model


def test_coarse_fields_golden(crop):
    d, model = crop
    dnx = float(d["dnx"])
    src = d["sources"]
    got = np.asarray(
        solver.solve_ttf(
            model, src[:, 1].astype(float) * dnx, src[:, 0].astype(float) * dnx
        )
    )
    want = d["fields"]
    mask = want > 0
    rel = np.abs(got - want)[mask] / want[mask]
    # reference-grade agreement on the real weld geometry (cf. the 41x45
    # isotropic golden: max < 6e-3, mean < 1.2e-3)
    assert rel.mean() < 2.5e-3, rel.mean()
    assert rel.max() < 2.0e-2, rel.max()


def test_fine_field_golden_edge_source(crop):
    """Edge (transducer-row) source on the fine grid.

    Away from the source this is a straight golden comparison.  Inside the
    analytic-seed radius the REFERENCE itself is wrong for edge sources:
    its stage copy-down loses the straight-ray seed values and the final
    march overestimates the near-source row (e.g. +56% one fine cell from
    the source, decaying to <2% by ~25 cells; the implied 3709 m/s is not
    attainable from any velocity-table entry, and the true first arrival
    through the homogeneous 5790 m/s parent around the source is the
    straight ray our frozen seed stores).  So near the source we assert
    the two *correctness* directions instead: never slower than the
    oracle's overestimate, never faster than the physical lower bound
    dist / v_max.
    """
    d, model = crop
    dnx = float(d["dnx"])
    s = int(d["fine_subgrid"])
    sz, sx = d["fine_source"]
    got = np.asarray(
        solver.solve_ttf(
            model, np.array([sx * dnx]), np.array([sz * dnx]), s
        )
    )[0]
    want = d["fine_field"]
    assert got.shape == want.shape
    Zf, Xf = want.shape
    zz = np.arange(Zf)[:, None] - sz * s
    xx = np.arange(Xf)[None, :] - sx * s
    near_src = (np.abs(zz) <= 18) & (np.abs(xx) <= 18)

    mask = (want > 0) & ~near_src
    rel = np.abs(got - want)[mask] / want[mask]
    assert rel.mean() < 2.5e-3, rel.mean()
    assert rel.max() < 2.0e-2, rel.max()

    # near-source box: we may be faster (the reference overestimates for
    # edge sources) but never slower, and never below the physical bound
    nmask = (want > 0) & near_src
    excess = ((got - want) / want)[nmask]
    assert excess.max() < 2.0e-2, excess.max()
    dist = np.sqrt(zz**2 + xx**2) * (dnx / s)
    vmax = 5790.0
    lower = dist / vmax
    assert np.all(got[nmask] >= lower[nmask] * (1 - 1e-6))


def test_rays_golden_production_pipeline(crop):
    """Production interp-mode pipeline (coarse solve + long-stride march +
    Fermat relaxation) must reproduce the oracle's exactly-integrated ray
    times on the real weld crop.  Rays are Fermat minimisers: a *lower*
    time than the oracle's is a better path, so the assertion bounds the
    signed excess."""
    d, model = crop
    dnx = float(d["dnx"])
    s = 9
    sz, sx = d["fine_source"]
    ttf = solver.solve_ttf(model, np.array([sx * dnx]), np.array([sz * dnx]))
    recs = d["ray_receivers"]
    src_xy = jnp.asarray(
        np.stack([recs[:, 1] * s, recs[:, 0] * s], 1).astype(float)
    )
    rec_xy = jnp.asarray(
        np.tile(np.array([[sx * s, sz * s]], dtype=float), (len(recs), 1))
    )
    tidx = jnp.zeros(len(recs), jnp.int32)
    rx, ry, lens, times = rayslib.trace_rays(
        model, ttf, tidx, src_xy, rec_xy, s, mode="interp",
        max_cross=8, step_scale=6, quad_vel=True, relax_iters=1,
        relax_quad=3, cand_stride=6.0,
    )
    got = np.asarray(times, np.float64)
    # oracle rays were traced at subgrid 3; its times rescale to true
    # seconds directly (find_ray integrates in original-grid units)
    want = d["ray_times"]
    excess = (got - want) / want
    # production pipeline typically lands *below* the oracle (better
    # Fermat minimisers, bench.py RAY_OPTS rationale); allow small excess
    assert np.all(excess < 7e-3), excess
    assert np.all(excess > -3e-2), excess
