from . import halo, mesh, sharded
from .mesh import CHAN_AXIS, TIME_AXIS, make_mesh
from .sharded import ShardedReceiver

__all__ = [
    "halo",
    "mesh",
    "sharded",
    "make_mesh",
    "ShardedReceiver",
    "TIME_AXIS",
    "CHAN_AXIS",
]

from . import multihost  # noqa: E402
__all__.append("multihost")
