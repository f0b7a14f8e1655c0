"""alifmm_tpu: TPU-native anisotropic travel-time fields and ray tracing.

A from-scratch JAX/XLA rebuild of the capabilities of the ALI-FMM reference
(WiPi-UoS/ALI-FMM-and-ray-tracing): first-arrival travel-time fields in
generally anisotropic 2D media and Fermat ray tracing through them, designed
TPU-first (parallel line-sweep solver, vmapped sources, shard_map scale-out)
instead of the reference's sequential heap-ordered fast marching.
"""

from .api import ALI_FMM  # noqa: F401
from .grid import Model, make_model, refine_model  # noqa: F401
from .solver import SolveConfig, solve_ttf  # noqa: F401

__version__ = "0.1.0"
