"""Matrix-product-state circuit engine (TPU-first design).

A third simulation regime alongside the dense state vector (O(2^n)) and
the Clifford tableau (O(n^2) bits): bounded-entanglement circuits at
100+ qubits in O(n * chi^2) memory. Reference (qubitrot/qubism) has no
analogue — its dense engine caps at ~13 qubits; this extends the same
program surface (QASM via ``--backend mps``, DSL prims) the way
``stabilizer/`` does.

TPU-native choices:

* **Static shapes, dynamic sites.** All n site tensors live in ONE
  stacked (n, chi, 2, chi) buffer of split float32 re/im planes — the
  engine-wide convention, and on this TPU runtime a hard requirement:
  complex dtypes are UNIMPLEMENTED on device (even ``conj``), so every
  kernel here is pure split-real arithmetic. Bond dimensions are padded
  to a fixed ``chi``, so every kernel compiles ONCE per (n, chi) and
  serves any site via ``lax.dynamic_slice`` — no per-site recompilation
  through the remote-compile tunnel.
* **Gate application is contract -> SVD -> truncate** on the
  orthogonality center (host-tracked integer; SVD shift kernels move
  it), keeping local truncation globally optimal. The SVDs run on
  device as a split-real one-sided Jacobi (``_svd.jacobi_svd`` — XLA's
  complex svd/qr custom calls don't exist on this backend); the
  (chi*2, chi*2) theta contraction is an MXU matmul.
* **Sampling / expectations are EXACT transfer contractions** via
  `lax.scan` over the stacked tensor — one scan builds the right
  environment stack, then shots vmap over it (per-shot cost O(n chi^2),
  any number of shots in one dispatch). Correctness never depends on
  canonical-form invariants, so padding rank-deficiency is harmless.
* **Non-adjacent gates ride SWAP routing** (the same discipline the
  dense engine uses for lane-safe reordering, ops/rdm.py): route the
  far qubit next to its partner, apply, route back.

Truncation weight (sum of discarded Schmidt squares) accumulates in
``MPSSim.trunc_error`` — zero while chi suffices, so exact simulation
is the default regime and degradation is observable.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.gates import Gate, Prim
from ..ops.apply import _sort_targets
from ._svd import jacobi_svd

__all__ = ["MPSSim", "NotAdjacentError"]

_SWAP = np.eye(4, dtype=complex)[[0, 2, 1, 3]]


class NotAdjacentError(ValueError):
    """Raised for k>2-qubit prims the MPS backend cannot route."""


def _site(re, im, q, chi):
    """Site q's tensor as a split (re, im) pair of (chi, 2, chi) planes."""
    a = lax.dynamic_slice(re, (q, 0, 0, 0), (1, chi, 2, chi))[0]
    b = lax.dynamic_slice(im, (q, 0, 0, 0), (1, chi, 2, chi))[0]
    return a, b


def _put(re, im, q, tr, ti):
    re = lax.dynamic_update_slice(re, tr[None], (q, 0, 0, 0))
    im = lax.dynamic_update_slice(im, ti[None], (q, 0, 0, 0))
    return re, im


def _ce(spec, ar, ai, br, bi):
    """Complex einsum in split-real planes (this TPU runtime implements
    NO complex ops — see _svd.py): (a_r + i a_i) x (b_r + i b_i).
    precision=HIGHEST: TPU matmuls default to bf16 MXU passes, which
    drifts amplitudes ~1e-4 (the engine-wide einsum rule, ops/apply.py)."""
    hi = lax.Precision.HIGHEST
    return (jnp.einsum(spec, ar, br, precision=hi)
            - jnp.einsum(spec, ai, bi, precision=hi),
            jnp.einsum(spec, ar, bi, precision=hi)
            + jnp.einsum(spec, ai, br, precision=hi))


# ---------------------------------------------------------------------------
# Jitted kernels (one compile per (n, chi) shape; q is traced)
# ---------------------------------------------------------------------------


def _apply_1q_body(re, im, ur, ui, q):
    chi = re.shape[1]
    ar, ai = _site(re, im, q, chi)
    or_, oi_ = _ce("ts,asb->atb", ur, ui, ar, ai)
    return _put(re, im, q, or_, oi_)


def _apply_2q_body(re, im, ur, ui, q, early_exit: bool = True):
    """Dense 4x4 on adjacent sites (q, q+1); truncating SVD back to chi.
    Returns (re, im, discarded_weight). Renormalizes the kept spectrum
    so the state norm is preserved under truncation. The SVD is the
    split-real on-device Jacobi (``_svd.jacobi_svd``)."""
    chi = re.shape[1]
    ar, ai = _site(re, im, q, chi)
    br, bi = _site(re, im, q + 1, chi)
    thr, thi = _ce("asc,ctb->astb", ar, ai, br, bi)
    thr = thr.reshape(chi, 4, chi)
    thi = thi.reshape(chi, 4, chi)
    thr, thi = _ce("pq,aqb->apb", ur, ui, thr, thi)
    mr = thr.reshape(chi * 2, 2 * chi)
    mi = thi.reshape(chi * 2, 2 * chi)
    uur, uui, s, vvr, vvi = jacobi_svd(mr, mi, early_exit=early_exit)
    s1 = s[:chi]
    kept = jnp.sum(s1 * s1)
    tot = jnp.sum(s * s)
    disc = tot - kept
    scale = lax.rsqrt(jnp.maximum(kept, 1e-30)) * jnp.sqrt(
        jnp.maximum(tot, 1e-30))
    a2r = uur[:, :chi].reshape(chi, 2, chi)
    a2i = uui[:, :chi].reshape(chi, 2, chi)
    # b2 = scale * diag(s1) V^H[:chi, :]  (V^H row k = conj(V[:, k]))
    b2r = (scale * s1[:, None] * vvr[:, :chi].T).reshape(chi, 2, chi)
    b2i = (-scale * s1[:, None] * vvi[:, :chi].T).reshape(chi, 2, chi)
    re, im = _put(re, im, q, a2r, a2i)
    re, im = _put(re, im, q + 1, b2r, b2i)
    return re, im, disc


def _shift_right_body(re, im, c, early_exit: bool = True):
    """Canonicalize site c as an isometry via SVD (A = U diag(s) V^H);
    absorb diag(s) V^H into site c+1 (center c -> c+1)."""
    chi = re.shape[1]
    ar, ai = _site(re, im, c, chi)
    uur, uui, s, vvr, vvi = jacobi_svd(ar.reshape(chi * 2, chi),
                                       ai.reshape(chi * 2, chi),
                                       early_exit=early_exit)
    absr = s[:, None] * vvr.T           # diag(s) V^H
    absi = -(s[:, None] * vvi.T)
    br, bi = _site(re, im, c + 1, chi)
    b2r, b2i = _ce("ac,csb->asb", absr, absi, br, bi)
    re, im = _put(re, im, c, uur.reshape(chi, 2, chi),
                  uui.reshape(chi, 2, chi))
    return _put(re, im, c + 1, b2r, b2i)


def _shift_left_body(re, im, c, early_exit: bool = True):
    """Mirror of _shift_right_body: SVD of A^H gives A = V diag(s) U^H;
    site c becomes the row-isometry U^H, V diag(s) absorbs left."""
    chi = re.shape[1]
    ar, ai = _site(re, im, c, chi)
    # A is (chi, 2chi); Jacobi orthogonalizes columns, so run it on A^H.
    uur, uui, s, vvr, vvi = jacobi_svd(ar.reshape(chi, 2 * chi).T,
                                       -(ai.reshape(chi, 2 * chi).T),
                                       early_exit=early_exit)
    q2r = uur.T.reshape(chi, 2, chi)    # U^H
    q2i = -(uui.T.reshape(chi, 2, chi))
    lr = vvr * s[None, :]               # L = V diag(s)
    li = vvi * s[None, :]
    br, bi = _site(re, im, c - 1, chi)
    b2r, b2i = _ce("asb,bc->asc", br, bi, lr, li)
    re, im = _put(re, im, c, q2r, q2i)
    return _put(re, im, c - 1, b2r, b2i)


_k_apply_1q = jax.jit(_apply_1q_body)
_k_apply_2q = jax.jit(_apply_2q_body)
_k_shift_right = jax.jit(_shift_right_body)
_k_shift_left = jax.jit(_shift_left_body)

#: Tape opcodes for the one-dispatch chain executor (_k_chain): the host
#: flattens a whole prim stream — SWAP routing and center shifts included —
#: into (opcode, site, 4x4-u) rows; the device replays it as one lax.scan
#: whose body switches between the kernel bodies above. Tapes are padded
#: to power-of-two length buckets with NOPs so compiles are reused.
_OP_2Q, _OP_SHIFT_R, _OP_SHIFT_L, _OP_1Q, _OP_NOP = range(5)
#: General 1-qubit 2-Kraus channel slot (state-DEPENDENT branch choice:
#: amplitude/phase damping). Row layout: K0 in urs[:2, :2], K1 in
#: urs[:2, 2:4]; the per-row uniform rides the ``us`` scan input. The
#: tape code is unbatched under vmap, so lax.switch stays real control
#: flow and the two norm contractions in this arm only run on K rows.
_OP_K1Q = 5


def _norm2_body(re, im):
    """<psi|psi> by exact transfer contraction (e0 boundaries)."""
    chi = re.shape[1]
    e0r = jnp.zeros((chi, chi), dtype=jnp.float32).at[0, 0].set(1)
    e0i = jnp.zeros((chi, chi), dtype=jnp.float32)

    def step(env, planes):
        er, ei = env
        ar, ai = planes
        tr, ti = _ce("aA,Asc->asc", er, ei, ar, ai)
        er, ei = _ce("asb,asc->bc", ar, -ai, tr, ti)   # a^H from the left
        return (er, ei), None

    (er, _), _ = lax.scan(step, (e0r, e0i), (re, im))
    return er[0, 0]


def _scale_site_body(re, im, q, s):
    chi = re.shape[1]
    ar, ai = _site(re, im, q, chi)
    return _put(re, im, q, ar * s, ai * s)


@partial(jax.jit, static_argnames=("early_exit",))
def _k_chain(re, im, codes, qs, urs, uis, us, early_exit: bool = True):
    """Replay an op tape: codes (L,) int32, qs (L,) int32, urs/uis
    (L, 4, 4) float32 (1q gates live in the top-left 2x2 block), us (L,)
    float32 uniforms (consumed only by _OP_K1Q rows; pass zeros for
    noiseless tapes). Returns (re, im, total_discarded_weight)."""

    def step(carry, inp):
        re, im, acc = carry
        code, q, ur, ui, u = inp

        def do_2q(_):
            return _apply_2q_body(re, im, ur, ui, q, early_exit=early_exit)

        def do_shift_r(_):
            r2, i2 = _shift_right_body(re, im, q, early_exit=early_exit)
            return r2, i2, jnp.float32(0)

        def do_shift_l(_):
            r2, i2 = _shift_left_body(re, im, q, early_exit=early_exit)
            return r2, i2, jnp.float32(0)

        def do_1q(_):
            r2, i2 = _apply_1q_body(re, im, ur[:2, :2], ui[:2, :2], q)
            return r2, i2, jnp.float32(0)

        def do_nop(_):
            return re, im, jnp.float32(0)

        def do_k1q(_):
            # MCWF branch: p(K0) = ||K0 psi||^2 / ||psi||^2; the chosen
            # branch is renormalized back to the incoming norm (exact
            # transfer contractions — no canonical-form assumption)
            ntot = jnp.maximum(_norm2_body(re, im), jnp.float32(1e-30))
            r0, i0 = _apply_1q_body(re, im, ur[:2, :2], ui[:2, :2], q)
            n0 = _norm2_body(r0, i0)
            take0 = u < n0 / ntot
            r1, i1 = _apply_1q_body(re, im, ur[:2, 2:4], ui[:2, 2:4], q)
            rs = jnp.where(take0, r0, r1)
            ms = jnp.where(take0, i0, i1)
            nsel = jnp.where(take0, n0, ntot - n0)
            sc = lax.rsqrt(jnp.maximum(nsel / ntot, jnp.float32(1e-30)))
            rs, ms = _scale_site_body(rs, ms, q, sc)
            return rs, ms, jnp.float32(0)

        re2, im2, d = lax.switch(
            code, (do_2q, do_shift_r, do_shift_l, do_1q, do_nop, do_k1q),
            None)
        return (re2, im2, acc + d), None

    (re, im, acc), _ = lax.scan(step, (re, im, jnp.float32(0)),
                                (codes, qs, urs, uis, us))
    return re, im, acc


_k_norm2 = jax.jit(_norm2_body)
_k_scale_site = jax.jit(_scale_site_body)


@jax.jit
def _k_expect(re, im, opr, opi):
    """<psi| prod_i O_i |psi> for per-site 2x2 ops stacked (n, 2, 2).
    Returns the (re, im) pair of the scalar."""
    chi = re.shape[1]
    e0r = jnp.zeros((chi, chi), dtype=jnp.float32).at[0, 0].set(1)
    e0i = jnp.zeros((chi, chi), dtype=jnp.float32)

    def step(env, inp):
        er, ei = env
        ar, ai, o_r, o_i = inp
        tr, ti = _ce("aA,Atc->atc", er, ei, ar, ai)
        tr, ti = _ce("st,atc->asc", o_r, o_i, tr, ti)
        er, ei = _ce("asb,asc->bc", ar, -ai, tr, ti)
        return (er, ei), None

    (er, ei), _ = lax.scan(step, (e0r, e0i), (re, im, opr, opi))
    return er[0, 0], ei[0, 0]


@jax.jit
def _k_amplitude(re, im, bits):
    """<bits|psi> (bits (n,) int32, site order = qubit order).
    Returns the (re, im) pair of the scalar."""
    chi = re.shape[1]
    v0r = jnp.zeros(chi, dtype=jnp.float32).at[0].set(1)
    v0i = jnp.zeros(chi, dtype=jnp.float32)

    def step(v, inp):
        vr, vi = v
        ar, ai, s = inp
        return _ce("a,ab->b", vr, vi, ar[:, s, :], ai[:, s, :]), None

    (vr, vi), _ = lax.scan(step, (v0r, v0i), (re, im, bits))
    return vr[0], vi[0]


@jax.jit
def _k_right_envs(re, im):
    """Stack of right environments: env[i] = contraction of sites
    i+1..n-1 with the e0 boundary — env[i][b,b'] so that
    p(prefix) = v env v^H. (n, chi, chi) split planes."""
    chi = re.shape[1]
    e0r = jnp.zeros((chi, chi), dtype=jnp.float32).at[0, 0].set(1)
    e0i = jnp.zeros((chi, chi), dtype=jnp.float32)

    def step(env, planes):
        er, ei = env
        ar, ai = planes
        tr, ti = _ce("asb,bB->asB", ar, ai, er, ei)
        nr, ni = _ce("asB,AsB->aA", tr, ti, ar, -ai)   # x a^H on the right
        return (nr, ni), (er, ei)

    _, (envr, envi) = lax.scan(step, (e0r, e0i), (re, im), reverse=True)
    return envr, envi


@jax.jit
def _k_sample(re, im, envr, envi, keys):
    """Perfect MPS sampling: one lax.scan per shot over sites (vmapped
    across the shots axis), conditioning on the exact right-environment
    stack — valid for ANY (even non-canonical) MPS. (shots, n) uint8."""

    chi = re.shape[1]

    def one(key):
        v0r = jnp.zeros(chi, dtype=jnp.float32).at[0].set(1)
        v0i = jnp.zeros(chi, dtype=jnp.float32)

        def prob(wr, wi, er, ei):
            # Re( w^T env conj(w) )
            tr, ti = _ce("b,bB->B", wr, wi, er, ei)
            return jnp.sum(tr * wr + ti * wi)

        def step(carry, inp):
            vr, vi, key = carry
            ar, ai, er, ei = inp
            w0r, w0i = _ce("a,ab->b", vr, vi, ar[:, 0, :], ai[:, 0, :])
            w1r, w1i = _ce("a,ab->b", vr, vi, ar[:, 1, :], ai[:, 1, :])
            p0 = prob(w0r, w0i, er, ei)
            p1 = prob(w1r, w1i, er, ei)
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub)
            bit = (u * (p0 + p1) >= p0).astype(jnp.uint8)
            wr = jnp.where(bit == 1, w1r, w0r)
            wi = jnp.where(bit == 1, w1i, w0i)
            p = jnp.where(bit == 1, p1, p0)
            inv = lax.rsqrt(jnp.maximum(p, 1e-30))
            return (wr * inv, wi * inv, key), bit

        _, bits = lax.scan(step, (v0r, v0i, key), (re, im, envr, envi))
        return bits

    return jax.vmap(one)(keys)


# ---------------------------------------------------------------------------
# Host-side simulator
# ---------------------------------------------------------------------------

def build_tape(prims, center: int, on_gate=None):
    """Flatten a prim iterable into the op-tape representation (SWAP
    routing and orthogonality-center shifts included). ``on_gate(tape,
    sites, logical)`` — if given — runs right after each CIRCUIT gate's
    rows land (before any SWAP walk-back), with the physical site(s) the
    gate's logical qubits occupy at that moment and the matching LOGICAL
    qubit indices (``sites[k]`` currently holds ``logical[k]``; they
    differ only for routed non-adjacent 2q gates): the noise-slot
    insertion hook of mps/noise.py. Returns (tape, final_center); the
    single source of truth for tape construction (MPSSim.apply and the
    noisy trajectory executor both build here)."""
    tape = []                              # (code, site, 2x2/4x4 u or None)

    def move(target):
        nonlocal center
        while center < target:
            tape.append((_OP_SHIFT_R, center, None))
            center += 1
        while center > target:
            tape.append((_OP_SHIFT_L, center, None))
            center -= 1

    def adj2(u, q):
        nonlocal center
        move(q if center <= q else q + 1)
        tape.append((_OP_2Q, q, u))
        center = q + 1

    for p in prims:
        u = np.diag(p.u) if p.diag else np.asarray(p.u)
        un, tgts = _sort_targets(np.asarray(u, dtype=np.complex128),
                                 p.targets)
        if len(tgts) == 1:
            tape.append((_OP_1Q, tgts[0], un))
            if on_gate is not None:
                on_gate(tape, (tgts[0],), (tgts[0],))
        elif len(tgts) == 2:
            a, b = tgts
            for j in range(b - 1, a, -1):  # route qubit b down to a+1
                adj2(_SWAP, j)
            adj2(un, a)
            if on_gate is not None:
                on_gate(tape, (a, a + 1), (a, b))
            for j in range(a + 1, b):      # walk it back
                adj2(_SWAP, j)
        else:
            raise NotAdjacentError(
                f"the MPS backend applies 1- and 2-qubit prims; got a "
                f"{len(tgts)}-qubit prim on {tgts}. Decompose it "
                f"(qelib1-style) first.")
    return tape, center


def pack_tape(tape, length: int):
    """Pack (code, site, u) rows into the _k_chain scan arrays, padded
    with NOPs to ``length``."""
    codes = np.full(length, _OP_NOP, dtype=np.int32)
    qs = np.zeros(length, dtype=np.int32)
    urs = np.zeros((length, 4, 4), dtype=np.float32)
    uis = np.zeros((length, 4, 4), dtype=np.float32)
    for k, (code, q, u) in enumerate(tape):
        codes[k] = code
        qs[k] = q
        if u is not None:
            d = u.shape[0]
            urs[k, :d, :d] = u.real
            uis[k, :d, :d] = u.imag
    return codes, qs, urs, uis


_PAULI = {
    "I": np.eye(2, dtype=complex),
    "X": np.array([[0, 1], [1, 0]], dtype=complex),
    "Y": np.array([[0, -1j], [1j, 0]], dtype=complex),
    "Z": np.diag([1.0, -1.0]).astype(complex),
}


class MPSSim:
    """Bounded-bond-dimension circuit simulator.

    ``chi`` caps the Schmidt rank across every cut: simulation is exact
    while the circuit's entanglement fits (``trunc_error`` stays 0.0)
    and degrades gracefully past it. Qubit q lives at site q; qubit 0
    is the most significant basis bit (engine-wide convention).

    ``trunc_budget`` turns the truncation weight from a report into a
    CONTRACT: when an ``apply`` would push the accumulated
    ``trunc_error`` past the budget, the engine rolls the call back
    (jax arrays are immutable — the snapshot is free), doubles ``chi``
    (zero-padding the site tensors; exact), and re-runs, up to
    ``max_chi``. Users no longer guess chi up front: start small, pay
    bond dimension only when the entanglement arrives. A run that hits
    ``max_chi`` and still exceeds the budget raises (the honest
    failure — silently wrong Schmidt spectra are the worst outcome).
    """

    def __init__(self, n: int, chi: int = 32, seed: int | None = None,
                 key=None, trunc_budget: float | None = None,
                 max_chi: int = 256):
        if n < 1:
            raise ValueError("MPSSim needs n >= 1")
        self.n = n
        self.chi = chi
        self.trunc_budget = trunc_budget
        self.max_chi = max(max_chi, chi)
        re = np.zeros((n, chi, 2, chi), dtype=np.float32)
        re[:, 0, 0, 0] = 1.0
        self.re = jnp.asarray(re)
        self.im = jnp.zeros((n, chi, 2, chi), dtype=jnp.float32)
        self.center = 0
        #: discarded-weight parts stay DEVICE scalars until read: a
        #: float() per apply is a full remote-tunnel round trip, which
        #: doubled the noisy-trajectory bench (one sync per tape)
        self._disc_parts: list = []
        self._trunc_host = 0.0
        self.key = key if key is not None else jax.random.PRNGKey(
            0 if seed is None else seed)

    @property
    def trunc_error(self) -> float:
        """Total discarded Schmidt weight so far (0.0 = exact). Reading
        it syncs any pending device parts — cheap once, not per apply."""
        if self._disc_parts:
            self._trunc_host += float(np.sum(np.asarray(
                jax.device_get(self._disc_parts), dtype=np.float64)))
            self._disc_parts = []
        return self._trunc_host

    def _grow(self, new_chi: int) -> None:
        """Double the padded bond dimension: zero-pad every site tensor
        (exact — padding never changes the represented state)."""
        chi = self.chi
        re = np.zeros((self.n, new_chi, 2, new_chi), dtype=np.float32)
        im = np.zeros_like(re)
        re[:, :chi, :, :chi] = np.asarray(self.re)
        im[:, :chi, :, :chi] = np.asarray(self.im)
        self.re = jnp.asarray(re)
        self.im = jnp.asarray(im)
        self.chi = new_chi

    # -- center management --------------------------------------------------

    def _move_center(self, target: int) -> None:
        while self.center < target:
            self.re, self.im = _k_shift_right(self.re, self.im, self.center)
            self.center += 1
        while self.center > target:
            self.re, self.im = _k_shift_left(self.re, self.im, self.center)
            self.center -= 1

    # -- gate application ---------------------------------------------------

    def _apply_1q(self, u: np.ndarray, q: int) -> None:
        u = np.asarray(u, dtype=np.complex128)
        self.re, self.im = _k_apply_1q(
            self.re, self.im,
            jnp.asarray(u.real, dtype=jnp.float32),
            jnp.asarray(u.imag, dtype=jnp.float32), q)

    def _apply_2q_adj(self, u: np.ndarray, q: int) -> None:
        self._move_center(q if self.center <= q else q + 1)
        u = np.asarray(u, dtype=np.complex128)
        self.re, self.im, disc = _k_apply_2q(
            self.re, self.im,
            jnp.asarray(u.real, dtype=jnp.float32),
            jnp.asarray(u.imag, dtype=jnp.float32), q)
        self.center = q + 1
        self._disc_parts.append(disc)

    def _apply_2q(self, u: np.ndarray, a: int, b: int) -> None:
        """Sorted targets a < b; SWAP-route b down to a+1 and back."""
        if b == a + 1:
            self._apply_2q_adj(u, a)
            return
        for j in range(b - 1, a, -1):          # qubit b walks left to a+1
            self._apply_2q_adj(_SWAP, j)
        self._apply_2q_adj(u, a)
        for j in range(a + 1, b):              # walk it back
            self._apply_2q_adj(_SWAP, j)

    @staticmethod
    def _flatten(gate_or_prims):
        prims = getattr(gate_or_prims, "prims", gate_or_prims)
        if isinstance(prims, (Gate, Prim)):
            prims = (prims,)
        for p in prims:
            if isinstance(p, Gate):
                yield from MPSSim._flatten(p.prims)
            else:
                yield p

    def apply(self, gate_or_prims) -> "MPSSim":
        """Apply a prim stream. The ENTIRE stream — SWAP routing and
        orthogonality-center shifts included — is flattened host-side
        into one opcode tape and replayed as a single ``_k_chain``
        dispatch: a whole circuit costs one device program instead of
        one per gate (the remote-dispatch tunnel charges ~30-100 ms per
        jitted call; see utils/profiling notes). Tapes pad to power-of-
        two buckets so recompiles stop once buckets repeat.

        Under a ``trunc_budget``, a call whose truncation weight would
        break the budget rolls back, doubles ``chi`` and retries (see
        the class docstring)."""
        tape, center = build_tape(self._flatten(gate_or_prims), self.center)
        if not tape:
            return self
        length = max(8, 1 << (len(tape) - 1).bit_length())
        packed = pack_tape(tape, length)
        while True:
            snap = (self.re, self.im)            # immutable: free snapshot
            re, im, disc = _k_chain(
                self.re, self.im, *(jnp.asarray(a) for a in packed),
                jnp.zeros(length, dtype=jnp.float32))
            if self.trunc_budget is None:
                # no budget: nothing branches on disc — keep it a device
                # value (syncing it per apply costs a tunnel round trip)
                self.re, self.im = re, im
                self._disc_parts.append(disc)
                self.center = center
                return self
            disc = float(disc)
            if self.trunc_error + disc <= self.trunc_budget:
                self.re, self.im = re, im
                break
            if self.chi >= self.max_chi:
                self.re, self.im = snap
                raise FloatingPointError(
                    f"trunc_budget {self.trunc_budget:g} exceeded at "
                    f"max_chi={self.max_chi} (this apply discarded "
                    f"{disc:g} of Schmidt weight); raise max_chi or the "
                    f"budget")
            self.re, self.im = snap
            self._grow(min(2 * self.chi, self.max_chi))
        self.center = center
        self._disc_parts.append(disc)
        return self

    # -- observables --------------------------------------------------------

    def norm(self) -> float:
        return math.sqrt(max(float(_k_norm2(self.re, self.im)), 0.0))

    def expectation(self, pauli: str) -> float:
        """<psi|P|psi> / <psi|psi> for a length-n I/X/Y/Z string."""
        if len(pauli) != self.n or any(c not in _PAULI for c in pauli):
            raise ValueError(f"bad Pauli string for n={self.n}: {pauli!r}")
        ops = np.stack([_PAULI[c] for c in pauli])
        val_re, _ = _k_expect(self.re, self.im,
                              jnp.asarray(ops.real, dtype=jnp.float32),
                              jnp.asarray(ops.imag, dtype=jnp.float32))
        n2 = float(_k_norm2(self.re, self.im))
        return float(np.asarray(val_re)) / max(n2, 1e-30)

    def expectation_sum(self, terms) -> float:
        """<H> for H = sum coef * P: ALL Pauli strings ride one vmapped
        transfer-scan dispatch (ops stacked (k, n, 2, 2))."""
        coefs = []
        ops = []
        for coef, pauli in terms:
            if len(pauli) != self.n or any(c not in _PAULI for c in pauli):
                raise ValueError(
                    f"bad Pauli string for n={self.n}: {pauli!r}")
            coefs.append(float(coef))
            ops.append(np.stack([_PAULI[c] for c in pauli]))
        ops = np.stack(ops)                     # (k, n, 2, 2)
        vals_re, _ = jax.vmap(
            lambda opr, opi: _k_expect(self.re, self.im, opr, opi)
        )(jnp.asarray(ops.real, dtype=jnp.float32),
          jnp.asarray(ops.imag, dtype=jnp.float32))
        n2 = max(float(_k_norm2(self.re, self.im)), 1e-30)
        return float(np.asarray(vals_re) @ np.asarray(coefs)) / n2

    def amplitude(self, bits) -> complex:
        """<bits|psi>; bits is an n-sequence of 0/1 (bits[0] = qubit 0)."""
        bits = np.asarray(list(bits), dtype=np.int32)
        if bits.shape != (self.n,):
            raise ValueError("amplitude wants one bit per qubit")
        vr, vi = _k_amplitude(self.re, self.im, jnp.asarray(bits))
        return complex(float(np.asarray(vr)), float(np.asarray(vi)))

    def to_statevec(self) -> np.ndarray:
        """Dense (2^n,) amplitudes (test oracle; n <= 14 guard)."""
        if self.n > 14:
            raise ValueError("to_statevec is O(2^n); n > 14 refused")
        re = np.asarray(self.re, dtype=np.float64)
        im = np.asarray(self.im, dtype=np.float64)
        a = re + 1j * im
        v = a[0, 0]                       # (2, chi)
        for i in range(1, self.n):
            v = np.einsum("...a,asb->...sb", v, a[i])
        return v[..., 0].reshape(-1)

    # -- measurement / sampling ---------------------------------------------

    def sample(self, shots: int, key=None) -> np.ndarray:
        """``shots`` independent full-register measurements
        (non-destructive). (shots, n) uint8, column q = qubit q."""
        if key is None:
            self.key, key = jax.random.split(self.key)
        envr, envi = _k_right_envs(self.re, self.im)
        keys = jax.random.split(key, shots)
        bits = _k_sample(self.re, self.im, envr, envi, keys)
        return np.asarray(bits, dtype=np.uint8)

    def prob_one(self, q: int) -> float:
        """P(qubit q = 1)."""
        pauli = "".join("Z" if i == q else "I" for i in range(self.n))
        return (1.0 - self.expectation(pauli)) / 2.0

    def measure_qubit(self, q: int) -> int:
        """Projective mid-circuit measurement: draw, project, renormalize."""
        p1 = min(max(self.prob_one(q), 0.0), 1.0)
        self.key, sub = jax.random.split(self.key)
        out = int(jax.random.uniform(sub) < p1)
        proj = np.zeros((2, 2), dtype=complex)
        proj[out, out] = 1.0
        self._apply_1q(proj, q)
        nrm = self.norm()
        if nrm < 1e-15:
            raise FloatingPointError("measurement collapsed to zero norm")
        self.re, self.im = _k_scale_site(
            self.re, self.im, self.center, jnp.float32(1.0 / nrm))
        return out

    def measure_qubits(self, qubits) -> list[int]:
        return [self.measure_qubit(q) for q in qubits]

    def reset(self, q: int) -> None:
        """Project qubit q onto |0> and renormalize — the reference's
        reset semantics (Simulation.hs:146-156; an entangled partner
        collapses consistently with 0, never via a Born draw). A
        |1>-certain qubit (zero-norm projection) falls back to the
        physical measure-then-X-flip reset."""
        proj = np.zeros((2, 2), dtype=complex)
        proj[0, 0] = 1.0
        re, im, center = self.re, self.im, self.center
        self._apply_1q(proj, q)
        nrm = self.norm()
        if nrm < 1e-15:
            self.re, self.im, self.center = re, im, center
            self._apply_1q(_PAULI["X"], q)
            return
        self.re, self.im = _k_scale_site(
            self.re, self.im, self.center, jnp.float32(1.0 / nrm))

    def entanglement_entropy(self, bond: int) -> float:
        """Von Neumann entropy (nats) across the cut between qubit
        ``bond`` and ``bond+1``."""
        if not 0 <= bond < self.n - 1:
            raise ValueError("bond out of range")
        self._move_center(bond)
        chi = self.chi
        a = np.asarray(self.re, dtype=np.float64)[bond] + \
            1j * np.asarray(self.im, dtype=np.float64)[bond]
        s = np.linalg.svd(a.reshape(chi * 2, chi), compute_uv=False)
        p = s * s
        tot = p.sum()
        if tot <= 0:
            return 0.0
        p = p[p > 1e-14] / tot
        return float(-(p * np.log(p)).sum())
