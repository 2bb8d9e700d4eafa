"""QEC memory experiments on the Pauli-frame executor.

The canonical workload the 1000-qubit stabilizer engine exists for:
r rounds of syndrome extraction (CX fan-in to ancillas, measure, reset)
under phenomenological noise, decoded offline. Each trajectory is a
(2n)-BIT Pauli frame; the whole experiment — every round's mid-circuit
measurement and reset included — runs as ONE ``lax.scan`` over the
interleaved tape (``stabilizer/frames.py:frame_run_vals_events``), so a
distance-500 (999-qubit) memory with thousands of trajectories costs
megabytes and milliseconds, where per-trajectory tableaux would need
gigabytes.

The reference simulator has no error-correction tooling (its dense
engine caps near 13 qubits — src/Qubism/QGate.hs:80); its
``errorCorrection.qasm`` example is a single 3-qubit repetition-code
round. This module is the scaled-up TPU-native extension of exactly
that example's physics.

Noise model: **phenomenological bit-flip** — between rounds every data
qubit flips with probability p (explicit identity prims mark the error
locations; ``noise_identity_only`` keeps the syndrome-extraction CXs
noiseless), syndrome measurement itself is perfect. Under this model
the repetition code has a closed-form logical error rate (see
:func:`repetition_logical_rate`), which pins the executor end to end.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.gates import Prim
from ..run.compiler import EvGates, EvMeasure, EvReset

__all__ = ["repetition_memory", "repetition_logical_rate",
           "RepetitionMemoryResult"]

_I2 = np.eye(2, dtype=np.complex128)
_CX = np.eye(4, dtype=np.complex128)[[0, 1, 3, 2]]


class _FrameProg:
    """The minimal prog surface ``frame_run_vals_events`` consumes."""

    def __init__(self, n, cdfs, creg_sizes):
        self.n = n
        self.cdfs = cdfs
        self.cdfs2 = np.zeros((0, 16), np.float32)
        self.creg_names = sorted(creg_sizes)
        self.creg_sizes = creg_sizes
        self.readout_p = None
        self.noise_identity_only = True


class RepetitionMemoryResult:
    """Outcome record of :func:`repetition_memory`.

    ``syndromes[k]`` is the (ntraj, d-1) round-k syndrome record,
    ``data`` the (ntraj, d) final data measurement, ``logical_errors``
    the per-trajectory majority-vote verdicts, ``logical_rate`` their
    mean, and ``analytic`` the closed-form rate the run must match.
    """

    def __init__(self, d, rounds, p, syndromes, data):
        self.d = d
        self.rounds = rounds
        self.p = p
        self.syndromes = syndromes
        self.data = data
        # majority-vote decoding of the final data readout: with perfect
        # syndrome measurement the final syndrome is a function of the
        # final data word, so majority(data) IS the minimum-weight decode
        self.logical_errors = (data.sum(axis=1) > d // 2)
        self.logical_rate = float(self.logical_errors.mean())
        self.analytic = repetition_logical_rate(d, rounds, p)
        # consistency pin: the last round's syndrome must equal the
        # parity of adjacent final data bits for EVERY trajectory
        # (syndrome extraction is noiseless here) — a wrong frame
        # propagation cannot satisfy this identity by luck
        want = (data[:, :-1] ^ data[:, 1:]).astype(np.int32)
        self.syndrome_consistent = bool((syndromes[-1] == want).all())


def repetition_logical_rate(d: int, rounds: int, p: float) -> float:
    """Closed-form logical error rate of the distance-d repetition code
    after ``rounds`` rounds of per-qubit bit-flip probability p with
    perfect syndrome measurement and majority-vote decoding: each data
    qubit's cumulative flip probability is ``q = (1 - (1-2p)^r) / 2``
    (independent across qubits), and the decoder errs iff more than
    (d-1)/2 qubits flipped — a binomial tail."""
    q = (1.0 - (1.0 - 2.0 * p) ** rounds) / 2.0
    return float(sum(math.comb(d, k) * q ** k * (1 - q) ** (d - k)
                     for k in range(d // 2 + 1, d + 1)))


def repetition_memory(d: int, rounds: int, p: float, ntraj: int,
                      seed: int = 0) -> RepetitionMemoryResult:
    """Run a distance-d repetition-code memory experiment: data qubits
    0..d-1 (prepared |0..0>), ancillas d..2d-2; per round, an identity
    row on every data qubit carries the bf(p) error channel, CX pairs
    extract the d-1 parities into the ancillas, the ancillas are
    measured (creg ``s{k}``) and reset. A final data measurement (creg
    ``m``) closes the experiment. 2d-1 qubits, one frame scan for all
    ``ntraj`` trajectories."""
    import jax

    from ..stabilizer.frames import frame_run_vals_events

    if d < 3 or d % 2 == 0:
        raise ValueError("repetition_memory wants odd d >= 3")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    n = 2 * d - 1
    anc = tuple(range(d, n))
    events = []
    creg_sizes = {}
    for k in range(rounds):
        events.append(EvGates(tuple(Prim(_I2, (q,)) for q in range(d))))
        # two disjoint-qubit CX layers (even fan-in, then odd): the frame
        # executor packs each into ONE layered scan step
        events.append(EvGates(tuple(Prim(_CX, (i, d + i))
                                    for i in range(d - 1))))
        events.append(EvGates(tuple(Prim(_CX, (i + 1, d + i))
                                    for i in range(d - 1))))
        name = f"s{k}"
        creg_sizes[name] = d - 1
        events.append(EvMeasure(anc, ((name, None, d - 1),)))
        events.append(EvReset(anc))
    creg_sizes["m"] = d
    events.append(EvMeasure(tuple(range(d)), (("m", None, d),)))

    probs = np.cumsum(np.asarray([1 - p, p, 0.0, 0.0], np.float32))
    prog = _FrameProg(n, probs.reshape(1, 4), creg_sizes)
    key = jax.random.PRNGKey(seed)
    vals = frame_run_vals_events(prog, events, ntraj, key)
    syndromes = [np.asarray(vals[f"s{k}"]) for k in range(rounds)]
    data = np.asarray(vals["m"])
    return RepetitionMemoryResult(d, rounds, p, syndromes, data)
