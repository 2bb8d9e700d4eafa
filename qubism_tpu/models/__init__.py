"""Circuit families for benchmarks and examples."""

from .circuits import (  # noqa: F401
    adder_qasm,
    brickwork_prims,
    brickwork_qasm,
    ghz_prims,
    ghz_qasm,
    qft_prims,
    qft_qasm,
)
