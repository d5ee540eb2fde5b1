"""Fused Pallas TPU kernels shadowing the jnp kernels (property-tested equal).

Import is safe everywhere; kernels run in interpreter mode on CPU for tests
and compiled on TPU.
"""

from . import frontend
from .frontend import MixCascadeKernel

__all__ = ["frontend", "MixCascadeKernel"]
