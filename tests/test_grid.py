"""Grid refinement parity against the reference finer_grid_n / _n_2."""

import numpy as np
import pytest

import jax.numpy as jnp

from alifmm_tpu import grid as gridlib

from ref_shim import load_reference

ref = load_reference()


@pytest.mark.parametrize("scale", [3, 5, 9, 27])
def test_refine_nearest_matches_reference(scale):
    rng = np.random.default_rng(scale)
    arr = rng.uniform(0, 100, (5, 7))
    want = ref.finer_grid_n(arr, scale, np.float64)
    got = np.asarray(gridlib.refine_nearest(jnp.asarray(arr), scale))
    np.testing.assert_array_equal(got, want)


def test_refine_nearest_int_truncation():
    # default int32 dtype truncates float inputs (Anis_TTF_rays.py:27)
    arr = np.array([[1.7, 2.2], [3.9, 4.1]])
    want = ref.finer_grid_n(arr, 3)  # default numba.int32
    got = np.asarray(gridlib.refine_nearest(jnp.asarray(arr), 3, jnp.int32))
    np.testing.assert_array_equal(got, want)


def test_refine_nearest_3d_matches_reference():
    # finer_grid_n_2 itself cannot run un-jitted (`data == None` on an array,
    # Anis_TTF_rays.py:72), but it applies finer_grid_n's layout per channel
    # (:82-90), so compare channel-wise against the verified 2D oracle.
    rng = np.random.default_rng(0)
    arr = rng.integers(1000, 300000, (4, 6, 5)).astype(np.int64)
    got = np.asarray(gridlib.refine_nearest_3d(jnp.asarray(arr), 5))
    for c in range(5):
        want_c = ref.finer_grid_n(arr[:, :, c].astype(float), 5, np.int64)
        np.testing.assert_array_equal(got[:, :, c], want_c)
