"""Trotterized Hamiltonian dynamics: |psi(t)> = exp(-iHt) |psi(0)>.

The reference has no time-evolution capability at all (its only dynamics
is gate application, src/Qubism/QGate.hs:79-84); this module is a
beyond-reference capability that falls out of the TPU engine design: the
``(coef, pauli_string)`` terms that :mod:`qubism_tpu.models.hamiltonians`
emits are exponentiated term-by-term into rotation prims
``exp(-i theta/2 P)`` and composed into first- or second-order (Strang)
Trotter steps — plain :class:`~qubism_tpu.core.gates.Prim` streams, so the
fusion engine, virtual shards, the mesh path, sampling and the Pauli-sum
expectation machinery all apply unchanged.

Pure Z-strings exponentiate to *diagonal* prims (the fusion layer folds
whole ladders of them into one streaming pass), so e.g. a TFIM Trotter
step is one diagonal pass + one 1q-layer pass regardless of chain length.

Error model (standard Trotter bounds): first order O(t^2/steps), Strang
O(t^3/steps^2) per total evolution — tests pin both rates against a dense
``expm`` oracle.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.gates import Prim

_P1 = {
    "X": np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex),
    "Y": np.array([[0.0, -1.0j], [1.0j, 0.0]], dtype=complex),
    "Z": np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex),
}

# dense rotation prims materialize 2^k x 2^k hosts-side matrices; past
# this support size the term should be split (or the Hamiltonian is not
# local in any meaningful sense)
_MAX_SUPPORT = 6


def _support(pauli: str) -> tuple[tuple[int, ...], str]:
    """(targets, compact letters) for the non-identity positions.

    ``pauli[q]`` acts on qubit q (qubit 0 = most significant index bit,
    matching the expectation surfaces, SURVEY.md section 2.4.4)."""
    targets = tuple(q for q, c in enumerate(pauli) if c != "I")
    letters = "".join(pauli[q] for q in targets)
    for c in letters:
        if c not in "XYZ":
            raise ValueError(f"bad Pauli letter {c!r} in {pauli!r}")
    return targets, letters


def pauli_rotation_prim(theta: float, pauli: str) -> Prim | None:
    """``exp(-i theta/2 * P)`` as one Prim on P's support.

    Since P^2 = I this is exactly ``cos(theta/2) I - i sin(theta/2) P`` —
    no matrix exponential needed. Pure Z-strings (and the empty string)
    produce a *diagonal* prim: entry ``exp(-i theta/2 * (-1)^parity)``.
    Returns None for an identity string (a global phase the simulator
    does not track — same convention as the reference's gate algebra)."""
    targets, letters = _support(pauli)
    if not targets:
        return None
    k = len(targets)
    if k > _MAX_SUPPORT:
        raise ValueError(
            f"Pauli term {pauli!r} has weight {k} > {_MAX_SUPPORT}; "
            f"split the term or coarse-grain the Hamiltonian")
    half = 0.5 * theta
    if set(letters) == {"Z"}:
        idx = np.arange(1 << k)
        parity = np.zeros(1 << k, dtype=np.int64)
        for b in range(k):
            parity ^= (idx >> (k - 1 - b)) & 1
        sign = 1.0 - 2.0 * parity  # +1 even parity, -1 odd
        d = np.exp(-1.0j * half * sign)
        return Prim(d, targets, diag=True)
    p = _P1[letters[0]]
    for c in letters[1:]:
        p = np.kron(p, _P1[c])
    u = math.cos(half) * np.eye(1 << k, dtype=complex) \
        - 1.0j * math.sin(half) * p
    return Prim(u, targets)


def pauli_exp_prim(a: float, pauli: str) -> Prim | None:
    """``exp(-a * P)`` (a real) as one NON-unitary Prim on P's support:
    ``cosh(a) I - sinh(a) P``. The engine applies arbitrary matrices, so
    imaginary-time factors ride the same kernels as real-time rotations;
    pure Z-strings are diagonal (entries ``exp(-a * (+-1))``). None for
    the identity string (a scalar rescale the per-step normalization
    absorbs anyway)."""
    targets, letters = _support(pauli)
    if not targets:
        return None
    k = len(targets)
    if k > _MAX_SUPPORT:
        raise ValueError(
            f"Pauli term {pauli!r} has weight {k} > {_MAX_SUPPORT}; "
            f"split the term or coarse-grain the Hamiltonian")
    if set(letters) == {"Z"}:
        idx = np.arange(1 << k)
        parity = np.zeros(1 << k, dtype=np.int64)
        for b in range(k):
            parity ^= (idx >> (k - 1 - b)) & 1
        sign = 1.0 - 2.0 * parity
        return Prim(np.exp(-a * sign).astype(complex), targets, diag=True)
    p = _P1[letters[0]]
    for c in letters[1:]:
        p = np.kron(p, _P1[c])
    u = math.cosh(a) * np.eye(1 << k, dtype=complex) - math.sinh(a) * p
    return Prim(u, targets)


def ite_step_prims(terms, dtau: float, order: int = 2) -> list[Prim]:
    """One imaginary-time Trotter step of ``exp(-dtau * sum_j c_j P_j)``
    (same first-order / Strang splittings as :func:`trotter_step_prims`)."""
    if order == 1:
        seq = [(c * dtau, p) for c, p in terms]
    elif order == 2:
        half = [(c * dtau / 2.0, p) for c, p in terms]
        seq = half + half[::-1]
    else:
        raise ValueError(f"order must be 1 or 2, got {order}")
    out = []
    for a, p in seq:
        prim = pauli_exp_prim(a, p)
        if prim is not None:
            out.append(prim)
    return out


def imaginary_time_evolve(state, terms, tau: float, steps: int,
                          order: int = 2, record_energy: bool = False,
                          **compile_kwargs):
    """Ground-state projection by imaginary-time evolution:
    ``psi(tau) = exp(-tau H) psi0 / ||...||`` suppresses every excited
    component by ``exp(-tau (E_k - E_0))``, so for any psi0 with nonzero
    ground-state overlap the energy ``<H>(tau)`` converges to E_0 from
    above. A variational-free ground-state solver on the same engine as
    the VQE path (models/variational.py) — useful as its independent
    cross-check.

    The state is renormalized after every step (the factors are
    non-unitary; float32 planes under/overflow otherwise). Returns
    ``(final_state, energies)`` where ``energies[i] = <H>`` after step i
    (computed only when ``record_energy``; else an empty list)."""
    from ..core.statevec import StateVec
    from ..ops.fusion import CompiledCircuit

    n = state.n
    step = CompiledCircuit(n, ite_step_prims(terms, tau / steps, order),
                           virtual_shards=0, **compile_kwargs)
    cur = StateVec(n, step(_own_planes(state.planes, n))).normalize()
    energies = []
    if record_energy:
        energies.append(cur.expectation_sum(terms))
    for _ in range(steps - 1):
        cur = StateVec(n, step(cur.planes)).normalize()
        if record_energy:
            energies.append(cur.expectation_sum(terms))
    return cur, energies


def trotter_step_prims(terms, dt: float, order: int = 2) -> list[Prim]:
    """One Trotter step of ``exp(-i dt * sum_j c_j P_j)``.

    order=1: Lie product  prod_j exp(-i c_j dt P_j).
    order=2: Strang split prod_j exp(-i c_j dt/2 P_j) * (reversed prod).
    Terms are exponentiated in the given order — group commuting terms
    adjacently (as the :mod:`hamiltonians` builders already do) so the
    fusion layer folds them into shared passes."""
    if order == 1:
        seq = [(2.0 * c * dt, p) for c, p in terms]
    elif order == 2:
        half = [(c * dt, p) for c, p in terms]
        seq = half + half[::-1]
    else:
        raise ValueError(f"order must be 1 or 2, got {order}")
    out = []
    for theta, p in seq:
        prim = pauli_rotation_prim(theta, p)
        if prim is not None:
            out.append(prim)
    return out


def trotter_prims(terms, t: float, steps: int, order: int = 2) -> list[Prim]:
    """The full ``exp(-iHt)`` circuit: ``steps`` repeated Trotter steps.

    The step stream is replicated host-side (prims are tiny host arrays;
    the engine jits per fused chunk, and identical chunks share the
    compile cache), so deep evolutions cost compile time O(one step)."""
    if steps < 1:
        raise ValueError("steps must be >= 1")
    step = trotter_step_prims(terms, t / steps, order)
    return step * steps


def _own_planes(planes, n: int):
    """A private copy of ``planes``: the fused executor donates its input
    buffers (in-place chains), which would silently invalidate the
    caller's StateVec. One streaming copy is noise against any multi-step
    evolution."""
    import jax.numpy as jnp

    del n
    return tuple(jnp.array(p, copy=True) for p in planes)


def evolve(state, terms, t: float, steps: int, order: int = 2,
           **compile_kwargs):
    """Evolve a :class:`~qubism_tpu.core.statevec.StateVec` under the
    Pauli-sum Hamiltonian ``terms`` for time ``t``: returns psi(t).

    Runs the prims through :class:`~qubism_tpu.ops.fusion.CompiledCircuit`
    (single-chip representation; for n > 29 build the circuit yourself
    with ``virtual_shards`` or use the mesh path)."""
    from ..core.statevec import StateVec
    from ..ops.fusion import CompiledCircuit

    n = state.n
    circ = CompiledCircuit(n, trotter_prims(terms, t, steps, order),
                           virtual_shards=0, **compile_kwargs)
    return StateVec(n, circ(_own_planes(state.planes, n)))


def evolve_observed(state, terms, observables, t: float, steps: int,
                    order: int = 2, record_every: int = 1,
                    **compile_kwargs):
    """Evolve while recording observables: returns ``(times, values,
    final_state)`` with ``values[i][j] = <obs_j>(times[i])``.

    Each observable is a Pauli-sum ``[(coef, pauli), ...]`` (a bare
    string means ``[(1.0, string)]``). One compiled segment of
    ``record_every`` Trotter steps is reused across the whole sweep, and
    the t=0 point is included."""
    from ..core.statevec import StateVec
    from ..ops.fusion import CompiledCircuit

    obs = [[(1.0, o)] if isinstance(o, str) else list(o)
           for o in observables]
    n = state.n
    if steps % record_every:
        raise ValueError("record_every must divide steps")
    dt_seg = t * record_every / steps
    seg = CompiledCircuit(
        n, trotter_prims(terms, dt_seg, record_every, order),
        virtual_shards=0, **compile_kwargs)
    times = [0.0]
    values = [[state.expectation_sum(o) for o in obs]]
    cur = _own_planes(state.planes, n)
    n_seg = steps // record_every
    for i in range(n_seg):
        cur = seg(cur)
        sv = StateVec(n, cur)
        times.append(dt_seg * (i + 1))
        values.append([sv.expectation_sum(o) for o in obs])
    return np.array(times), np.array(values), StateVec(n, cur)


# ---------------------------------------------------------------------------
# Open-system (Lindblad) dynamics on the density engine
# ---------------------------------------------------------------------------


def _expm(a: np.ndarray) -> np.ndarray:
    """Matrix exponential by scaling-and-squaring + Taylor (host-side,
    dependency-free; the inputs are tiny 4^k x 4^k superoperators)."""
    a = np.asarray(a, dtype=np.complex128)
    nrm = float(np.linalg.norm(a, 1))
    s = max(0, int(math.ceil(math.log2(nrm))) + 1) if nrm > 0 else 0
    x = a / (1 << s)
    term = np.eye(a.shape[0], dtype=np.complex128)
    out = term.copy()
    for k in range(1, 24):
        term = term @ x / k
        out += term
    for _ in range(s):
        out = out @ out
    return out


def dissipator_kraus(l_op: np.ndarray, rate: float,
                     dt: float) -> list[np.ndarray]:
    """The EXACT Kraus decomposition of ``exp(dt * D_L)`` for one
    k-local jump operator, ``D_L(rho) = rate (L rho L^dag -
    {L^dag L, rho}/2)``: exponentiate the (4^k, 4^k) superoperator
    host-side (row-major vec: ``vec(A X B) = (A kron B^T) vec(X)``),
    reshuffle to the Choi matrix, and eigendecompose. Each factor is
    CPTP by construction, so the integrator below preserves trace
    exactly at any step size."""
    L = np.asarray(l_op, dtype=np.complex128)
    d = L.shape[0]
    ldl = L.conj().T @ L
    eye = np.eye(d, dtype=np.complex128)
    sup = rate * (np.kron(L, np.conj(L))
                  - 0.5 * np.kron(ldl, eye)
                  - 0.5 * np.kron(eye, ldl.T))
    e = _expm(sup * dt)
    # J[(m,i),(n,j)] = E[(m,n),(i,j)]  (Choi reshuffle, row-major vec)
    choi = e.reshape(d, d, d, d).transpose(0, 2, 1, 3).reshape(d * d, d * d)
    w, v = np.linalg.eigh((choi + choi.conj().T) / 2.0)
    kraus = [math.sqrt(float(lam)) * v[:, a].reshape(d, d)
             for a, lam in enumerate(w) if lam > 1e-12]
    return kraus


def lindblad_evolve(rho, h_terms, collapse, t: float, steps: int,
                    order: int = 2, observables=None):
    """Integrate the Lindblad master equation ``drho/dt = -i[H, rho] +
    sum_a rate_a D_{L_a}(rho)`` on the density engine.

    Strang-split into exact CPTP factors: per step, each dissipator's
    exact half-step channel (:func:`dissipator_kraus` via
    ``DensityMatrix.apply_channel``), the unitary Trotter step of the
    Pauli-sum ``h_terms`` (:func:`trotter_step_prims`, ``order`` 1 or
    2), then the dissipator half-steps in reverse. Trace is preserved
    to machine precision at ANY step count; the splitting error is
    O(t^3/steps^2) against the exact solution.

    ``collapse``: iterable of ``(rate, l_matrix, targets)`` with
    ``l_matrix`` a (2^k, 2^k) jump operator on ``targets`` (an int or
    tuple). ``observables``: optional Pauli strings; when given,
    returns ``(rho, values)`` with ``values[s][j] = <P_j>`` after step
    s (t=0 included, shape (steps+1, len(observables))); else returns
    ``rho``. Evolves in place (the density engine's convention).

    Engine extension: the reference has no mixed states at all; this is
    the QuTiP-``mesolve`` shape on the vectorized 2^2n TPU engine, with
    every factor an existing channel/prim application (no new kernels).
    """
    dt = t / steps
    halves = []
    for rate, l_op, targets in collapse:
        if isinstance(targets, int):
            targets = (targets,)
        halves.append((tuple(targets),
                       dissipator_kraus(l_op, float(rate), dt / 2.0)))
    hstep = trotter_step_prims(h_terms, dt, order) if h_terms else []
    values = None
    if observables is not None:
        values = [[rho.expectation(p) for p in observables]]
    for _ in range(steps):
        for tg, kr in halves:
            rho.apply_channel(kr, tg)
        if hstep:
            rho.apply(hstep)
        for tg, kr in reversed(halves):
            rho.apply_channel(kr, tg)
        if values is not None:
            values.append([rho.expectation(p) for p in observables])
    if values is not None:
        return rho, np.asarray(values)
    return rho


def lindblad_step_program(h_terms, collapse, dt: float, order: int = 2):
    """ONE Strang step of the Lindblad generator as a trajectory program
    (Prims + :class:`~qubism_tpu.models.trajectories.ChannelOp`s):
    dissipator half-step channels, the unitary Trotter step, the halves
    reversed. Repeat ``steps`` times (Python list multiply) and feed to
    :func:`~qubism_tpu.models.trajectories.run_trajectories` — the MCWF
    unraveling of :func:`lindblad_evolve`, at memory T * 2^n instead of
    4^n."""
    from .trajectories import ChannelOp

    halves = []
    for rate, l_op, targets in collapse:
        if isinstance(targets, int):
            targets = (targets,)
        halves.append(ChannelOp(dissipator_kraus(l_op, float(rate),
                                                 dt / 2.0), tuple(targets)))
    hstep = trotter_step_prims(h_terms, dt, order) if h_terms else []
    return halves + hstep + halves[::-1]


def lindblad_mcwf(n: int, prep_prims, h_terms, collapse, t: float,
                  steps: int, ntraj: int, observables=None, seed: int = 0,
                  order: int = 2):
    """Monte-Carlo wavefunction integration of the master equation:
    ``ntraj`` pure trajectories of ``prep + steps x Strang step`` run as
    ONE vmapped device program. Returns ``(planes, estimates)`` where
    ``planes`` is the (T, 2^n) trajectory batch and ``estimates[j] =
    (mean, stderr)`` per observable Pauli string (None when
    ``observables`` is None) — converging to :func:`lindblad_evolve`'s
    exact density values at ~1/sqrt(T), at any n the pure engine
    reaches."""
    from .trajectories import run_trajectories, trajectory_expectation

    program = list(prep_prims) + lindblad_step_program(
        h_terms, collapse, t / steps, order) * steps
    planes = run_trajectories(n, program, ntraj, seed=seed)
    if observables is None:
        return planes, None
    return planes, [trajectory_expectation(planes, p, n)
                    for p in observables]


def correlation_observed(state, terms, a_pauli: str, b_pauli: str,
                         t: float, steps: int, order: int = 2,
                         record_every: int = 1, **compile_kwargs):
    """Dynamic correlation function ``C(t_k) = <psi| A(t_k) B |psi>``
    (``A(t) = e^{iHt} A e^{-iHt}``), the quantity whose Fourier
    transform is a spectral function.

    Two-state scheme: ``|u(t)> = e^{-iHt}|psi>`` and ``|w(t)> =
    e^{-iHt} B|psi>`` march together through ONE shared compiled Trotter
    segment, and each record point is a single fused pair reduction
    ``<u|A|w>`` (:mod:`ops.measure`'s two-state MXU path) — no dense
    operators, no extra state copies. Returns ``(times, C)`` with ``C``
    complex128 of length ``steps // record_every + 1`` (t=0 included).

    Engine extension: the reference has no dynamics; this is the
    linear-response workhorse (structure factors, Green's functions)
    on the same kernels as everything else."""
    import jax
    import jax.numpy as jnp

    from ..ops.fusion import CompiledCircuit
    from ..ops.measure import (_apply_iy, _check_pauli,
                               _expectation_pair_fn, apply_pauli_traced)

    n = state.n
    a_pauli = _check_pauli(a_pauli, n)
    b_pauli = _check_pauli(b_pauli, n)
    if steps % record_every:
        raise ValueError("record_every must divide steps")
    u = _own_planes(state.planes, n)
    w = jax.jit(lambda p: apply_pauli_traced(p, b_pauli, n))(u)
    pair = _expectation_pair_fn(a_pauli, n)
    n_y = sum(1 for c in a_pauli if c == "Y")

    def c_of(u_pl, w_pl):
        # fn(a, b) reduces <b|P|a>: here a = w, b = u -> <u|A|w>
        tr, ti = pair(w_pl, u_pl)
        return _apply_iy(float(tr), float(ti), n_y)

    dt_seg = t * record_every / steps
    seg = CompiledCircuit(
        n, trotter_prims(terms, dt_seg, record_every, order),
        virtual_shards=0, **compile_kwargs)
    times = [0.0]
    vals = [c_of(u, w)]
    for i in range(steps // record_every):
        u = seg(u)
        w = seg(w)
        times.append(dt_seg * (i + 1))
        vals.append(c_of(u, w))
    return np.asarray(times), np.asarray(vals, dtype=np.complex128)


def spectral_function(times: np.ndarray, corr: np.ndarray):
    """``(omegas, S)`` — the discrete Fourier transform of a uniformly
    sampled correlation record, ``S(omega) = dt * sum_k e^{i omega t_k}
    C(t_k)`` (fftshifted, ascending omega). Peaks sit at the excitation
    energies of the states ``B|psi>`` overlaps."""
    times = np.asarray(times, dtype=np.float64)
    dt = float(times[1] - times[0])
    s = np.fft.fftshift(np.fft.ifft(np.asarray(corr))) * len(corr) * dt
    omegas = np.fft.fftshift(np.fft.fftfreq(len(corr), dt)) * 2.0 * math.pi
    return omegas, s
