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

# Global progress-bar kill switch, mirroring the reference's module-level
# tqdm_disable flag (Anis_TTF_rays.py:22-24).  True silences the stage /
# ray bars shown by ALI_FMM.update and find_all_TTF_rays(_parallel).
tqdm_disable = False

__version__ = "0.1.0"
