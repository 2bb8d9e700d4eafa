"""Quantum-trajectory (Monte-Carlo wavefunction) noise simulation.

Unravels Kraus noise channels into stochastic PURE-state evolution: a
batch of T trajectories evolves as one jitted, vmapped device program —
unitaries are the same traced appliers the variational module uses, and
each :class:`ChannelOp` samples one Kraus branch per trajectory (branch
probability = its squared norm, the standard MCWF rule) and renormalizes.
Averaging any observable over trajectories converges to the exact
:class:`~qubism_tpu.core.density.DensityMatrix` value at memory cost
T * 2^n instead of 4^n — the TPU-native way to reach noisy 20+-qubit
circuits, where the vectorized rho (2^2n amplitudes) no longer fits.

The whole batch is ONE dispatch: `vmap` puts the trajectory axis on the
leading dimension of the (re, im) planes, every gate/channel branch is
traced code with static shapes, and the per-trajectory branch choice is
a gather — no host round-trips between gates. The reference
(qubitrot/qubism) is unitary-only; this extends its surface the same way
`core/density.py` does, with sampling error ~1/sqrt(T) instead of an
exponential memory blowup.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.gates import Gate, Prim
from ..ops.apply import _sort_targets, zero_state
from ..ops.measure import _check_pauli, _expectation_pair_body
from .variational import _apply_dense_traced, _apply_op

__all__ = [
    "ChannelOp",
    "trajectory_state_fn",
    "run_trajectories",
    "trajectory_expectation",
    "trajectory_pauli_sum",
    "trajectory_probs",
    "trajectory_sample",
]


@dataclass(frozen=True)
class ChannelOp:
    """A Kraus channel {K_k} on explicit targets, for trajectory programs.

    ``kraus`` is a sequence of (2^k, 2^k) complex matrices with
    sum_k K_k^dag K_k = I (checked); ``targets[0]`` is the most
    significant bit of the local index, matching :class:`Prim`.
    """

    kraus: tuple
    targets: tuple

    def __init__(self, kraus, targets):
        ks = tuple(np.asarray(k, dtype=np.complex128) for k in kraus)
        tgts = tuple(int(t) for t in targets)
        d = 1 << len(tgts)
        tot = sum(k.conj().T @ k for k in ks)
        if ks[0].shape != (d, d):
            raise ValueError(
                f"Kraus shape {ks[0].shape} does not match {len(tgts)} targets")
        if not np.allclose(tot, np.eye(d), atol=1e-8):
            raise ValueError("Kraus operators do not sum to identity (CPTP)")
        object.__setattr__(self, "kraus", ks)
        object.__setattr__(self, "targets", tgts)

    def shifted(self, offset: int) -> "ChannelOp":
        return ChannelOp(self.kraus, tuple(t + offset for t in self.targets))


def _elaborate(program):
    """Flatten Gates to prims; pre-sort channel Kraus matrices to sorted
    target order (host-side, once)."""
    items = []
    for it in program:
        if isinstance(it, ChannelOp):
            sorted_ks, tgts = [], None
            for k in it.kraus:
                un, tgts = _sort_targets(k, it.targets)
                sorted_ks.append(un)
            mix = _unitary_mix(sorted_ks)
            if mix is not None:
                items.append(("umix", mix, tgts))
                continue
            planes = [(jnp.asarray(un.real.astype(np.float32)),
                       jnp.asarray(un.imag.astype(np.float32)))
                      for un in sorted_ks]
            items.append(("channel", tuple(planes), tgts))
        elif isinstance(it, Gate):
            items.extend(it.prims)
        elif isinstance(it, Prim):
            items.append(it)
        else:
            raise TypeError(f"trajectory program item: {type(it).__name__}")
    return items


def _unitary_mix(kraus):
    """Host-side probe: if EVERY Kraus operator of a channel is a scaled
    unitary (K^dag K = p I — all Pauli / mixed-unitary channels: dep,
    dep2, bf, pf), the branch probabilities are state-independent, so a
    trajectory can draw the branch from a static CDF and apply ONE small
    unitary — instead of one full-state application *per Kraus branch*
    plus norm reductions (16x fewer state sweeps for dep2). Returns
    ``(cdf, urs, uis)`` numpy arrays (cdf (k,), planes (k, d, d)) or
    ``None`` when the channel needs the state-dependent MCWF weights
    (amplitude/phase damping)."""
    probs, us = [], []
    for k in kraus:
        k = np.asarray(k, dtype=np.complex128)
        g = k.conj().T @ k
        p = float(np.real(np.trace(g))) / g.shape[0]
        if p < 1e-12 or not np.allclose(g, p * np.eye(g.shape[0]),
                                        atol=1e-9):
            return None
        probs.append(p)
        us.append(k / np.sqrt(p))
    cdf = np.cumsum(np.asarray(probs, dtype=np.float32))
    urs = np.stack([m.real for m in us]).astype(np.float32)
    uis = np.stack([m.imag for m in us]).astype(np.float32)
    return cdf, urs, uis


def _apply_unitary_mix_traced(planes, mix, targets, n, u):
    """Apply a mixed-unitary channel branch: draw j from the static CDF,
    one-hot blend the SMALL (d, d) branch matrices (cheap, stays fused
    under vmap), apply once. Unitary branches preserve the norm — no
    renormalization sweep."""
    cdf, urs, uis = mix
    j = jnp.minimum(jnp.searchsorted(jnp.asarray(cdf), u, side="right"),
                    len(cdf) - 1)
    w = (jnp.arange(len(cdf)) == j).astype(jnp.float32)
    ur = jnp.tensordot(w, jnp.asarray(urs), axes=1)
    ui = jnp.tensordot(w, jnp.asarray(uis), axes=1)
    br = _apply_dense_traced(planes, ur, ui, targets, n)
    return br[0].reshape(-1), br[1].reshape(-1)


def _apply_channel_traced(planes, kraus_planes, targets, n, u):
    """Sample one Kraus branch (probability = squared norm of K_k|psi>,
    drawn with the uniform ``u``) and renormalize. All branches are
    computed in-trace (k small); selection is a gather so the whole
    channel stays one fused region under vmap."""
    branches = []
    norms = []
    for ur, ui in kraus_planes:
        br = _apply_dense_traced(planes, ur, ui, targets, n)
        branches.append(br)
        norms.append(jnp.sum(br[0] * br[0]) + jnp.sum(br[1] * br[1]))
    norms = jnp.stack(norms)
    cdf = jnp.cumsum(norms)
    j = jnp.searchsorted(cdf, u * cdf[-1], side="right")
    j = jnp.minimum(j, len(branches) - 1)
    # select via a one-hot weighted sum, NOT a stack+gather: a gather of
    # freshly-computed branch arrays blocks XLA fusion and (on CPU)
    # triggers rematerialization blowups in composed programs
    w = (jnp.arange(len(branches)) == j).astype(planes[0].dtype)
    re = sum(w[k] * b[0].reshape(-1) for k, b in enumerate(branches))
    im = sum(w[k] * b[1].reshape(-1) for k, b in enumerate(branches))
    scale = lax.rsqrt(jnp.maximum(jnp.sum(w * norms), jnp.float32(1e-30)))
    return re * scale, im * scale


def trajectory_state_fn(n: int, program):
    """``key -> (re, im)`` for ONE trajectory: jit/vmap-compatible.
    Channel draws derive from ``key`` by position (`fold_in`), so a
    trajectory is reproducible from its key alone."""
    items = _elaborate(program)

    def run(key):
        planes = zero_state(n)
        for i, item in enumerate(items):
            if isinstance(item, tuple) and item[0] in ("channel", "umix"):
                kind, kp, tgts = item
                u = jax.random.uniform(jax.random.fold_in(key, i))
                apply = (_apply_unitary_mix_traced if kind == "umix"
                         else _apply_channel_traced)
                planes = apply(planes, kp, tgts, n, u)
            else:
                planes = _apply_op(planes, item, None, n)
        return planes[0].reshape(-1), planes[1].reshape(-1)

    return run


def run_trajectories(n: int, program, ntraj: int, key=None, seed: int = 0):
    """Evolve ``ntraj`` trajectories of ``program`` (Prims/Gates mixed
    with ChannelOps) as one vmapped device program. Returns batched
    planes ((T, 2^n) re, (T, 2^n) im)."""
    if key is None:
        key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, ntraj)
    fn = jax.jit(jax.vmap(trajectory_state_fn(n, program)))
    return fn(keys)


def _mean_stderr(vals: np.ndarray) -> tuple[float, float]:
    vals = np.asarray(vals, dtype=np.float64)
    t = vals.shape[0]
    se = float(vals.std(ddof=1) / math.sqrt(t)) if t > 1 else float("inf")
    return float(vals.mean()), se


def _pauli_vals(planes, pauli: str, n: int):
    def one(re, im):
        tr, ti = _expectation_pair_body(pauli, n, (re, im), (re, im))
        k = sum(1 for c in pauli if c == "Y") % 4
        return (tr, -ti, -tr, ti)[k]  # Re((tr + i*ti) * i^k)

    return jax.jit(jax.vmap(one))(planes[0], planes[1])


def trajectory_expectation(planes, pauli: str, n: int):
    """Monte-Carlo estimate of <P>: (mean, standard error) over the
    trajectory batch. One vmapped reduction dispatch."""
    pauli = _check_pauli(pauli, n)
    return _mean_stderr(_pauli_vals(planes, pauli, n))


def trajectory_pauli_sum(planes, terms, n: int, constant: float = 0.0):
    """Monte-Carlo <H> for H = sum coef * P + constant: per-trajectory
    energies are summed in-trace (term loop unrolled), so the standard
    error accounts for cross-term correlations correctly."""
    checked = [(float(c), _check_pauli(p, n)) for c, p in terms]

    def one(re, im):
        e = jnp.float32(0.0)
        for coef, p in checked:
            tr, ti = _expectation_pair_body(p, n, (re, im), (re, im))
            k = sum(1 for c in p if c == "Y") % 4
            e = e + jnp.float32(coef) * (tr, -ti, -tr, ti)[k]
        return e

    mean, se = _mean_stderr(jax.jit(jax.vmap(one))(planes[0], planes[1]))
    return mean + constant, se


def trajectory_sample(planes, key=None, seed: int = 0) -> np.ndarray:
    """One full-register measurement record per trajectory (the standard
    MCWF readout: the shot ensemble converges to sampling the averaged
    rho). Returns (T, n) uint8, column q = qubit q (qubit 0 = most
    significant basis bit). One vmapped inverse-CDF dispatch."""
    if key is None:
        key = jax.random.PRNGKey(seed)
    re, im = planes
    t, size = re.shape
    n = size.bit_length() - 1
    keys = jax.random.split(key, t)

    def one(r, i, k):
        cdf = jnp.cumsum(r * r + i * i)
        u = jax.random.uniform(k) * cdf[-1]
        # clamp: u can round UP to >= cdf[-1] in float32, and an
        # out-of-range 2^n index would silently bit-decode to |0...0>
        return jnp.minimum(jnp.searchsorted(cdf, u, side="right"),
                           cdf.shape[0] - 1)

    idx = jax.jit(jax.vmap(one))(re, im, keys)
    idx = np.asarray(idx, dtype=np.int64)
    shifts = n - 1 - np.arange(n)
    return ((idx[:, None] >> shifts[None, :]) & 1).astype(np.uint8)


def trajectory_probs(planes) -> np.ndarray:
    """Trajectory-averaged Born probabilities (the diagonal of the
    estimated rho): (2^n,) float64. Converges to DensityMatrix.probs()."""
    re, im = planes
    return np.asarray(
        jnp.mean(re * re + im * im, axis=0), dtype=np.float64)
