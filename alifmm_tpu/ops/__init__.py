from . import stencils  # noqa: F401
