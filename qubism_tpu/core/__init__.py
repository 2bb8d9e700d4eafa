"""Core simulation kernel: state vectors, gates, classical registers."""

from .creg import CReg, ZERO, ONE, bit  # noqa: F401
from .density import (  # noqa: F401
    DensityMatrix,
    amplitude_damping,
    bit_flip,
    depolarizing,
    phase_damping,
    phase_flip,
)
from .statevec import StateVec, mk_state_vec, mk_qubit  # noqa: F401
from .gates import (  # noqa: F401
    Gate,
    Prim,
    ident,
    pauli_x,
    pauli_y,
    pauli_z,
    hadamard,
    phase,
    unitary,
    cnot,
    swap,
    controlled,
    if_bit,
    kronecker,
    on_just,
    on_every,
    on_range,
    u3_matrix,
)
