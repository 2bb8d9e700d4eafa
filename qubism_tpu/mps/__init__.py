"""Matrix-product-state circuit engine: bounded-entanglement circuits
at 100+ qubits in O(n * chi^2) memory. See :mod:`qubism_tpu.mps.engine`."""

from .engine import MPSSim, NotAdjacentError
from .noise import MPSTrajectoryProgram
from .program import MPSProgram

__all__ = ["MPSSim", "NotAdjacentError", "MPSProgram",
           "MPSTrajectoryProgram"]
