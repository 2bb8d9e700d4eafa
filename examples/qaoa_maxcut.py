"""Differentiable QAOA MaxCut, end to end: gradient-ascend the cut value
(one compiled lax.scan dispatch for the whole optimization), then SAMPLE
bitstrings at the optimum and report the best cut found — the complete
variational loop the reference engine could not express.

Run from the repo root:  python examples/qaoa_maxcut.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from qubism_tpu.models import (energy_fn, maxcut_terms, qaoa_maxcut_ansatz,
                               sample_fn, vqe_minimize)
from qubism_tpu.models.circuits import ring_edges

N, P, SHOTS = 8, 3, 2048


def cut_value(bits: str, edges) -> int:
    return sum(1 for i, j in edges if bits[i] != bits[j])


def main():
    edges = ring_edges(N)                       # max cut = 8 (even ring)
    ansatz = qaoa_maxcut_ansatz(N, edges, P)
    terms, const = maxcut_terms(N, edges)
    neg = [(-c, s) for c, s in terms]           # minimize -<C> = ascend <C>

    theta0 = np.full(2 * P, 0.2, dtype=np.float32)
    theta, hist = vqe_minimize(ansatz, neg, theta0, steps=300,
                               constant=-const)
    expected = -float(energy_fn(ansatz, neg, constant=-const)(theta))

    counts = sample_fn(ansatz)(theta, SHOTS)
    best = max(counts, key=lambda b: cut_value(b, edges))

    print(f"<C> initial -> optimized : {-float(hist[0]):.3f} -> {expected:.3f}")
    print(f"best sampled bitstring   : {best}  (cut {cut_value(best, edges)}"
          f" of max {len(edges)})")
    top = sorted(counts.items(), key=lambda kv: -kv[1])[:4]
    print("most frequent samples    :",
          ", ".join(f"{b} x{c} (cut {cut_value(b, edges)})" for b, c in top))


if __name__ == "__main__":
    main()
