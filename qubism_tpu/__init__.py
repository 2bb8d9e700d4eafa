"""qubism-tpu: a TPU-native OpenQASM 2.0 simulator and quantum-circuit DSL.

Umbrella module (counterpart of reference src/Qubism.hs:1-17): re-exports the
core DSL so users can ``import qubism_tpu as qt`` and write circuits
directly, mirroring the reference's Haskell DSL surface
(examples/Teleportation.hs).

The two user-facing surfaces:

1. the **DSL path** — :class:`StateVec`, :class:`Gate` constructors and
   combinators, and :class:`Session` for stateful programs with mid-circuit
   measurement and classical feed-forward;
2. the **QASM path** — :func:`parse_openqasm` / :func:`run_program` and the
   ``qubism`` CLI/REPL (``python -m qubism_tpu`` or the console script).
"""

from .config import config, TOLERANCE  # noqa: F401
from .core import (  # noqa: F401
    CReg,
    DensityMatrix,
    Gate,
    Prim,
    StateVec,
    bit,
    cnot,
    controlled,
    hadamard,
    ident,
    if_bit,
    kronecker,
    mk_qubit,
    mk_state_vec,
    on_every,
    on_just,
    on_range,
    pauli_x,
    pauli_y,
    pauli_z,
    phase,
    swap,
    u3_matrix,
    unitary,
)
from .core.density import (  # noqa: F401
    amplitude_damping,
    bit_flip,
    depolarizing,
    phase_damping,
    phase_flip,
)
from .core import algebra  # noqa: F401
from .session import Session  # noqa: F401
from .stabilizer import StabilizerSim  # noqa: F401
from .stabilizer.noise import StabilizerTrajectoryProgram  # noqa: F401
from .mps import MPSSim  # noqa: F401
from .mps.noise import MPSTrajectoryProgram  # noqa: F401
from .run.noisy import (  # noqa: F401
    DensityProgram,
    TrajectoryProgram,
    parse_noise_spec,
)

__version__ = "0.1.0"
