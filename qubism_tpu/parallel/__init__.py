"""Multi-device scaling: amplitude sharding, qubit-relabeling swaps."""

from .mesh import make_mesh  # noqa: F401
from .sharded import ShardedSim  # noqa: F401
from .density import ShardedDensityMatrix  # noqa: F401
