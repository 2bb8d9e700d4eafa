"""Compute kernels: gate application, measurement, fusion, Pallas fast paths."""

from .apply import apply_gate, apply_diag, tensor, normalize  # noqa: F401
from .measure import prob_one, collapse, measure_qubit, probabilities  # noqa: F401
