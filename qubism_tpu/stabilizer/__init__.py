"""Stabilizer (Clifford) backend: bit-packed Aaronson-Gottesman tableaus
on the TPU VPU. See :mod:`qubism_tpu.stabilizer.tableau`."""

from .program import StabilizerProgram
from .tableau import (NotCliffordError, StabilizerSim, Tableau, affine_support,
                      apply_prims, clifford_tables, expectation,
                      identity_tableau, measure_qubit, sample_bits,
                      stabilizer_strings)

__all__ = [
    "NotCliffordError",
    "StabilizerProgram",
    "StabilizerSim",
    "Tableau",
    "apply_prims",
    "expectation",
    "identity_tableau",
    "measure_qubit",
    "sample_bits",
    "stabilizer_strings",
]
