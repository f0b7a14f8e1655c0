"""Import the (read-only) reference implementation as a pure-Python oracle.

The reference at /root/reference/Anis_TTF_rays.py is numba-jitted; numba is
not installed in this image, so we install a minimal stub that turns
``@njit`` into a no-op decorator and maps the numba dtypes to numpy ones.
This lets the golden/parity tests execute the reference's *exact* original
logic (slowly, in pure Python) on small inputs without copying any of its
code into this repository.

Limitations (inherent to running the reference un-jitted):
* code paths that test a numpy array against None with ``==``/``!=``
  (e.g. ``if stif_den != None`` at Anis_TTF_rays.py:1531) only work when
  stif_den is actually None, so the oracle is used with table materials;
  the stiffness/density paths are validated against the closed-form math
  in test_materials.py instead.
"""

import sys
import types

import numpy as np

REFERENCE_DIR = "/root/reference"


def _install_numba_stub():
    if "numba" in sys.modules and getattr(sys.modules["numba"], "_is_stub", False):
        return
    stub = types.ModuleType("numba")
    stub._is_stub = True

    def njit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(fn):
            return fn

        return deco

    stub.njit = njit
    stub.jit = njit
    stub.int32 = np.int32
    stub.int64 = np.int64
    stub.float32 = np.float32
    stub.float64 = np.float64
    stub.uint8 = np.uint8
    sys.modules["numba"] = stub


_reference_module = None


def _finer_grid_n_2_arraysafe(data, scale):
    """Drop-in for the reference finer_grid_n_2 whose ``data == None`` test
    only works under numba; identical NN-upsample semantics for arrays."""
    if data is None:
        return None
    dim = data.shape
    k0 = np.clip((np.arange(scale * (dim[0] - 1) + 1) + scale // 2) // scale,
                 0, dim[0] - 1)
    k1 = np.clip((np.arange(scale * (dim[1] - 1) + 1) + scale // 2) // scale,
                 0, dim[1] - 1)
    return data[k0][:, k1].astype(np.int64)


def load_reference():
    """Import and cache the reference Anis_TTF_rays module."""
    global _reference_module
    if _reference_module is not None:
        return _reference_module
    _install_numba_stub()
    import matplotlib

    matplotlib.use("Agg")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import Anis_TTF_rays as ref

    ref.tqdm_disable = True
    # see _finer_grid_n_2_arraysafe: required for any un-jitted code path
    # that reaches finer_grid_n_2 with an actual array
    ref.finer_grid_n_2 = _finer_grid_n_2_arraysafe
    _reference_module = ref
    return ref
