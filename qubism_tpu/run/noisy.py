"""Whole-program quantum trajectories: noisy QASM in ONE device program.

The reference runs a program once, statement by statement
(src/Qubism/QASM/Simulation.hs:42-76), and has no noise story at all. This
module executes a full OpenQASM program — gates, Kraus noise channels,
mid-circuit measurement, classical feed-forward (``if (c==n)``), reset —
as a single traced function of a PRNG key, then ``vmap``s it over any
number of trajectories: S noisy shots (each with its OWN mid-circuit
measurement outcomes and feed-forward path) cost one compiled dispatch.

That is the TPU-native semantics the plain ``--shots`` sampler cannot
give: final-state sampling draws S outcomes from ONE collapsed run, while
a trajectory re-runs the program per shot — exactly what hardware does —
at T x 2^n memory. Every stochastic site (channel branch, measurement
draw) derives its uniform from ``fold_in(key, site_index)``, so a
trajectory is reproducible from its key alone.

Design notes:

* Classical registers live in-trace as int32 BIT VECTORS (entry k =
  bit k, the reference's LSB-first ``crToNatural`` pairing,
  src/Qubism/CReg.hs:36-39); ``if (c==n)`` compares against the
  constant's bit pattern, so kilobit registers (stabilizer-scale
  programs) are exact — no packed-integer overflow.
* Feed-forward is branch-free: the conditioned op is applied
  unconditionally and the result selected with ``jnp.where`` on the
  predicate (one wasted state-sweep per untaken branch; under vmap the
  lockstep trajectories take both sides anyway, so this is also the
  fast shape).
* ``reset`` is the reference's projection-to-|0> without a Born draw
  (Simulation.hs:146-156); measurement honors
  ``config.reference_sqrt_born``.
* Noise is circuit-level: each 1-qubit Kraus channel in the model is
  applied to every qubit a gate touches, after the gate; 2-qubit
  channels (dep2) fire once per 2-qubit gate as one joint draw;
  ``ro:p`` flips each REPORTED measurement bit (state unaffected).
* Channels can be RESTRICTED to qubits with an ``@`` target suffix —
  ``dep:0.02@q[0]+anc`` — the calibrated-device model (every real chip
  has per-qubit error rates). A targeted 1q channel fires only on gate
  qubits in its set; a targeted 2q channel (dep2) fires only when BOTH
  gate qubits are in the set (the "noise on this coupler" reading).
  Items are ``+``-separated: a qreg name (all its qubits), ``name[i]``
  (one qubit), or a bare absolute qubit index.
"""

from __future__ import annotations

import collections

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..core import density as channels
from ..core.creg import CReg
from ..models.trajectories import (_apply_channel_traced,
                                   _apply_unitary_mix_traced, _unitary_mix)
from ..models.variational import _apply_op
from ..ops.apply import _sort_targets, zero_state
from ..ops.measure import collapse_traced, prob_one_traced

__all__ = ["TrajectoryProgram", "DensityProgram", "parse_noise_spec",
           "NOISE_CHANNELS", "split_channel_target", "noise_spec_targets",
           "resolve_noise_targets"]

#: name (and aliases) -> 1-qubit Kraus-list factory taking one float param.
NOISE_CHANNELS = {
    "depolarizing": channels.depolarizing,
    "dep": channels.depolarizing,
    "depolarizing2": channels.depolarizing2,   # 2q gates only (see _exec)
    "dep2": channels.depolarizing2,
    "amplitude-damping": channels.amplitude_damping,
    "ad": channels.amplitude_damping,
    "phase-damping": channels.phase_damping,
    "pd": channels.phase_damping,
    "bitflip": channels.bit_flip,
    "bf": channels.bit_flip,
    "phaseflip": channels.phase_flip,
    "pf": channels.phase_flip,
}


def split_readout_spec(spec: str | None):
    """Extract a classical readout-error term (``ro:p`` / ``readout:p``)
    from a --noise spec. Returns (remaining_spec, p_or_None). Readout
    error is a REPORTING flip: each measured bit is written to the creg
    flipped with probability p, while the state collapses on the true
    outcome — the standard assignment-error model, applied identically
    by every trajectory engine (dense / stabilizer / frames / mps)."""
    rest, p = [], None
    for part in (spec or "").split(","):
        part = part.strip()
        if not part:
            continue
        name, sep, val = part.partition(":")
        if name.strip().lower() in ("ro", "readout"):
            if not sep:
                raise ValueError(
                    "readout channel needs a parameter (e.g. ro:0.01)")
            if "@" in val:
                raise ValueError(
                    "per-qubit readout-error targeting (ro:p@...) is not "
                    "supported; readout error applies to every measured "
                    "bit")
            p = float(val)
        else:
            rest.append(part)
    return ",".join(rest), p


def split_channel_target(part: str):
    """``"dep:0.01@q[2]+anc"`` -> ``("dep:0.01", "q[2]+anc")``; a part
    with no ``@`` returns ``(part, None)``."""
    core, sep, tgt = part.partition("@")
    if not sep:
        return part.strip(), None
    tgt = tgt.strip()
    if not tgt:
        raise ValueError(f"empty '@' target in noise part {part!r}")
    return core.strip(), tgt


def noise_spec_targets(spec: str):
    """The per-part ``@`` target specs of a --noise string, in spec
    order (None for untargeted parts). Parallel to
    :func:`parse_noise_spec`'s channel list; readout (``ro:p``) parts
    are excluded, mirroring :func:`split_readout_spec`."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        core, tspec = split_channel_target(part)
        name = core.partition(":")[0].strip().lower()
        if name in ("ro", "readout"):
            if tspec is not None:
                raise ValueError(
                    "per-qubit readout-error targeting (ro:p@...) is not "
                    "supported; readout error applies to every measured "
                    "bit")
            continue
        out.append(tspec)
    return out


def resolve_noise_targets(tspec: str, layout, qreg_sizes, n: int):
    """Resolve an ``@`` target spec into a frozenset of absolute qubit
    indices. ``layout`` maps qreg name -> first absolute qubit (the
    elaborator's layout), ``qreg_sizes`` maps name -> size, ``n`` is the
    total qubit count. Items are ``+``-separated: ``name`` (the whole
    qreg), ``name[i]``, or a bare absolute index."""
    qubits = set()
    for item in tspec.split("+"):
        item = item.strip()
        if not item:
            raise ValueError(f"empty item in noise target {tspec!r}")
        if item.isdigit():
            q = int(item)
            if q >= n:
                raise ValueError(
                    f"noise target qubit {q} out of range (n={n})")
            qubits.add(q)
            continue
        name, sep, idx = item.partition("[")
        name = name.strip()
        if name not in layout:
            raise ValueError(
                f"noise target {item!r}: no qreg named {name!r} "
                f"(declared: {sorted(layout) or 'none'})")
        base, size = layout[name], qreg_sizes[name]
        if not sep:
            qubits.update(range(base, base + size))
            continue
        idx = idx.strip()
        if not idx.endswith("]") or not idx[:-1].strip().isdigit():
            raise ValueError(f"malformed noise target {item!r}")
        k = int(idx[:-1])
        if k >= size:
            raise ValueError(
                f"noise target {item!r}: index {k} out of bounds for "
                f"{name}[{size}]")
        qubits.add(base + k)
    return frozenset(qubits)


def _normalize_noise(noise, layout, qreg_sizes, n):
    """Normalize a --noise value for a program: returns
    ``(chan_list, tsets)`` where chan_list is ``[(label, kraus_list,
    tset)]`` triples (``tset`` = frozenset of absolute qubits or None =
    all qubits — kept IN the entry so ``prog.noise`` round-trips into
    another program with its targeting intact) and tsets the parallel
    per-channel list. Accepts a spec string (``@`` targeting resolved
    against the program layout), or a parsed list whose entries are
    ``(label, ks)``, ``(label, ks, qubit_iterable)``, or round-tripped
    triples with a frozenset."""
    if noise is None:
        return [], []
    if isinstance(noise, str):
        chans, tsets = [], []
        for label, ks, tspec in _parse_noise_parts(noise):
            tset = (None if tspec is None
                    else resolve_noise_targets(tspec, layout, qreg_sizes, n))
            chans.append((label, ks, tset))
            tsets.append(tset)
        return chans, tsets
    chans, tsets = [], []
    for entry in noise:
        if len(entry) == 2:
            (label, ks), tset = entry, None
        else:
            label, ks, tgt = entry
            if tgt is None:
                tset = None
            else:
                qs = sorted(int(q) for q in tgt)
                bad = [q for q in qs if q < 0 or q >= n]
                if bad:
                    raise ValueError(
                        f"noise channel {label!r}: target qubit {bad[0]} "
                        f"out of range (n={n})")
                tset = frozenset(qs)
        chans.append((label, ks, tset))
        tsets.append(tset)
    return chans, tsets


def resolve_traj_mesh(mesh):
    """Resolve a ``--mesh`` value to a 1-axis ``("traj",)`` device mesh
    for sharding a trajectory batch, or ``None``.

    Trajectories are embarrassingly parallel — the one collective-free
    axis of a Monte-Carlo simulation — so unlike the amplitude-sharded
    state-vector path (``parallel/sharded.py``: ppermute swaps, psum
    measurement) the mesh here only splits the vmapped batch across
    chips: each device runs ``batch/D`` full trajectories and the only
    cross-device traffic is the final host gather of per-trajectory
    outcomes. Accepts a device count (``int``) or a prebuilt 1-axis
    :class:`jax.sharding.Mesh`.
    """
    from jax.sharding import Mesh

    if mesh is None:
        return None
    if isinstance(mesh, Mesh):
        if len(mesh.axis_names) != 1:
            raise ValueError("trajectory mesh must have exactly one axis")
        return mesh
    d = int(mesh)
    devs = jax.devices()
    if d > len(devs):
        raise ValueError(
            f"--mesh {d}: only {len(devs)} device(s) visible")
    if d <= 1:
        return None
    return Mesh(np.asarray(devs[:d]), ("traj",))


def _traj_sharding(m):
    """NamedSharding placing a batch's leading axis on the traj mesh."""
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(m, PartitionSpec("traj"))


def _parse_noise_parts(spec: str):
    """ONE tokenizer pass over a --noise spec: ``[(label, kraus_list,
    tspec_or_None), ...]`` — channel data and target specs come from the
    same walk, so they cannot fall out of index-parallel."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        part, tspec = split_channel_target(part)
        suffix = f"@{tspec}" if tspec else ""
        name, sep, val = part.partition(":")
        name = name.strip().lower()
        if name not in NOISE_CHANNELS:
            known = sorted(set(NOISE_CHANNELS) - {"dep", "ad", "pd", "bf",
                                                  "pf"})
            raise ValueError(
                f"unknown noise channel {name!r}; known: {', '.join(known)}")
        if not sep:
            raise ValueError(f"noise channel {name!r} needs a parameter "
                             f"(e.g. {name}:0.01)")
        p = float(val)
        out.append((f"{name}:{p}{suffix}", NOISE_CHANNELS[name](p), tspec))
    return out


def parse_noise_spec(spec: str):
    """``"depolarizing:0.01,ad:0.05"`` -> [(label, kraus_list), ...].

    A part may carry an ``@`` qubit-target suffix (``dep:0.01@q[2]``);
    the suffix is kept in the label but plays no role here — programs
    resolve it against their layout via :func:`_parse_noise_parts` +
    :func:`resolve_noise_targets`."""
    return [(label, ks) for label, ks, _ in _parse_noise_parts(spec)]


class TrajectoryProgram:
    """A QASM program compiled to one vmappable trajectory function.

    ``noise`` is a spec string (see :func:`parse_noise_spec`) or an
    already-parsed list; ``None`` runs noiseless trajectories (still
    useful: independent mid-circuit re-runs per shot).
    """

    def __init__(self, ast, noise=None):
        from .compiler import elaborate

        (self.n, self.events, self.cregs0, self.layout,
         self.qreg_sizes) = elaborate(ast)
        self.readout_p = None
        if isinstance(noise, str):
            noise, self.readout_p = split_readout_spec(noise)
        self.noise, self._tsets = _normalize_noise(
            noise, self.layout, self.qreg_sizes, self.n)
        self.creg_names = sorted(self.cregs0)
        self.creg_sizes = {c: len(self.cregs0[c].bits)
                           for c in self.creg_names}
        # Pre-split each channel's Kraus set once (host side), kept in
        # SPEC ORDER (non-commuting mixes like dep2+ad compose
        # differently per order; DensityProgram applies spec order, so
        # every engine must). 4x4 sets (dep2) fire only after 2q gates.
        # Mixed-unitary channels (all Paulis) take the one-application
        # CDF fast path (see models/trajectories._unitary_mix).
        # 2q channels carry BOTH target orderings (the dense applier
        # needs ascending targets, but `cx q[2], q[0]` is descending —
        # the SWAP-conjugated variant is picked statically in _exec).
        self._kchans = []
        for _, ks, _ in self.noise:
            is2q = np.asarray(ks[0]).shape[0] == 4
            variants = []
            for desc in ((False, True) if is2q else (False,)):
                kss = ([_sort_targets(np.asarray(k, dtype=complex),
                                      (1, 0))[0] for k in ks]
                       if desc else list(ks))
                mix = _unitary_mix(kss)
                if mix is not None:
                    variants.append(("umix", mix))
                    continue
                variants.append(("kraus", tuple(
                    (jnp.asarray(np.asarray(k).real, dtype=jnp.float32),
                     jnp.asarray(np.asarray(k).imag, dtype=jnp.float32))
                    for k in kss)))
            self._kchans.append((tuple(variants), is2q))
        self._site = 0  # stochastic-site counter (rebound per trace)

    # -- traced execution ---------------------------------------------------

    def _u(self, key):
        """Next stochastic uniform (site-indexed, key-derived)."""
        u = jax.random.uniform(jax.random.fold_in(key, self._site))
        self._site += 1
        return u

    @staticmethod
    def _sel(pred, new, old):
        if pred is None:
            return new
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(pred, a, b), new, old)

    def _readout(self, bits, key):
        """Apply the readout-error reporting flip (state already
        collapsed on the true bits)."""
        if not self.readout_p:
            return bits
        p = jnp.float32(self.readout_p)
        return [b ^ (self._u(key) < p).astype(jnp.int32) for b in bits]

    def _write_creg_bits(self, cregs, writes, bits, pred):
        """Store measured bits into the traced creg bit vectors:
        ``writes`` = per statement (creg, bit_index_or_None, count)."""
        off = 0
        for creg, bit_index, count in writes:
            old = cregs[creg]
            if bit_index is None:
                val = jnp.stack([b.astype(jnp.int32)
                                 for b in bits[off:off + count]])
            else:
                val = old.at[bit_index].set(bits[off])
            cregs[creg] = self._sel(pred, val, old)
            off += count

    def _cond_hit(self, cregs, ev):
        """`if (creg == value)` on a bit vector: compare against the
        constant's LSB-first bit pattern (exact at ANY register width)."""
        size = self.creg_sizes[ev.creg]
        if ev.value >> size:           # value cannot fit: never true
            return jnp.bool_(False)
        want = jnp.asarray([(ev.value >> k) & 1 for k in range(size)],
                           dtype=jnp.int32)
        return jnp.all(cregs[ev.creg] == want)

    def _exec(self, events, planes, cregs, key, pred):
        from .compiler import EvCond, EvDump, EvGates, EvMeasure, EvReset

        for ev in events:
            if isinstance(ev, EvGates):
                for p in ev.prims:
                    new = _apply_op(planes, p, None, self.n)
                    for (variants, is2q), tset in zip(self._kchans,
                                                      self._tsets):
                        if is2q:
                            if len(p.targets) != 2:
                                continue
                            t = tuple(int(q) for q in p.targets)
                            if tset is not None and not set(t) <= tset:
                                continue   # targeted coupler channel
                            kind, kp = variants[t[0] > t[1]]
                            apply = (_apply_unitary_mix_traced
                                     if kind == "umix"
                                     else _apply_channel_traced)
                            new = apply(new, kp, tuple(sorted(t)),
                                        self.n, self._u(key))
                        else:
                            kind, kp = variants[0]
                            apply = (_apply_unitary_mix_traced
                                     if kind == "umix"
                                     else _apply_channel_traced)
                            for q in p.targets:
                                if tset is not None and int(q) not in tset:
                                    continue
                                new = apply(new, kp, (int(q),), self.n,
                                            self._u(key))
                    planes = self._sel(pred, new, planes)
            elif isinstance(ev, EvMeasure):
                bits = []
                new = planes
                for q in ev.qubits:
                    p1 = prob_one_traced(new, q, self.n)
                    thr = jnp.sqrt(p1) if config.reference_sqrt_born else p1
                    bit = (self._u(key) < thr).astype(jnp.int32)
                    new = collapse_traced(new, bit, q, self.n)
                    bits.append(bit)
                planes = self._sel(pred, new, planes)
                self._write_creg_bits(cregs, ev.writes,
                                      self._readout(bits, key), pred)
            elif isinstance(ev, EvReset):
                new = planes
                for q in ev.qubits:
                    new = collapse_traced(new, 0, q, self.n)
                planes = self._sel(pred, new, planes)
            elif isinstance(ev, EvCond):
                hit = self._cond_hit(cregs, ev)
                sub = hit if pred is None else jnp.logical_and(pred, hit)
                planes, cregs = self._exec(ev.body, planes, cregs, key, sub)
            elif isinstance(ev, EvDump):
                pass  # no per-trajectory dump inside a vmapped program
            else:  # pragma: no cover
                raise TypeError(f"unknown event {type(ev).__name__}")
        return planes, cregs

    def _run_one(self, key):
        self._site = 0
        planes = zero_state(self.n) if self.n else None
        cregs = {c: jnp.zeros(self.creg_sizes[c], dtype=jnp.int32)
                 for c in self.creg_names}
        if self.n:
            planes, cregs = self._exec(self.events, planes, cregs, key, None)
        vals = tuple(cregs[c] for c in self.creg_names)
        return vals, planes

    # -- host API -----------------------------------------------------------

    #: Cap on simultaneously-live state words (batch x per-trajectory
    #: cost): 2^28 x 4 B = 2 GiB of live trajectory state per dispatch.
    _MAX_LIVE = 1 << 28

    def _traj_live_cost(self) -> int:
        """Per-trajectory live state in 4-byte words (dense planes)."""
        return 2 << max(self.n, 1)

    def run_vals(self, ntraj: int, seed: int | None = None, key=None,
                 return_states: bool = False, mesh=None,
                 max_live_words: int | None = None,
                 engine: str = "vmap"):
        """Run ``ntraj`` trajectories. Returns a dict creg name ->
        (ntraj, size) int32 outcome BIT arrays (column k = creg bit k,
        LSB-first — exact at any register width), plus the stacked
        final (re, im) planes when ``return_states``.

        Trajectories dispatch in vmapped batches sized so the live
        state block (batch x 2 x 2^n floats) stays under ~2 GiB per
        device; small runs are exactly one dispatch. ``mesh`` (a device
        count or 1-axis Mesh, see :func:`resolve_traj_mesh`) shards the
        batch axis over D devices — per-trajectory results are
        identical to the unsharded run with the same key (sharding only
        places lanes; padding keys never reach the output).
        ``max_live_words`` overrides the ~2 GiB default live-state cap
        (``_MAX_LIVE``) per device — raise it on chips with HBM headroom
        to cut dispatch count at large n (the n=26 bench runs 8
        trajectories/dispatch at 2^30 words OOM-free on a 16 GB v5e).

        ``engine="fused"`` runs whole-program workloads through the
        canonical-layout Pallas kernels in batched ``lax.scan`` dispatches
        (``run/traj_fused.py``): mixture noise is host-realized into gate
        coefficients, amplitude/phase damping runs as in-graph MCWF
        norm-branch sites with deferred-Kraus folding, and mid-circuit
        measurement / reset / feed-forward run in-graph too (marginal-
        table collapses; conditionals select realized operands against
        identity) — ~50x fewer state sweeps per trajectory at large n
        and ~1 dispatch per trajectory batch. It raises
        :class:`~..run.traj_fused.FusedUnsupported` only for reference
        sqrt-Born mode, >12-qubit mid-circuit events, >2-target prims
        and 2q state-dependent Kraus; its random stream is its own
        (statistically equivalent, not bit-identical to the vmapped
        engine's). ``engine="auto"`` tries fused and silently falls back
        to vmap."""
        if engine not in ("vmap", "fused", "auto"):
            raise ValueError(f"unknown engine {engine!r}")
        if engine == "fused" and type(self) is not TrajectoryProgram:
            # subclasses (MPS/stabilizer trajectories) re-use this host
            # API but their states are not dense canonical planes
            raise ValueError(
                f"engine='fused' applies to the dense state-vector "
                f"engine, not {type(self).__name__}")
        if (engine in ("fused", "auto") and type(self) is TrajectoryProgram
                and not return_states and mesh is None):
            from .traj_fused import FusedUnsupported, run_vals_fused

            # the fused engine consumes a host seed, not a PRNG key: an
            # explicit key must still change the stream (fold its data
            # into the seed) instead of being silently dropped
            fseed = seed
            if key is not None:
                data = np.asarray(jax.random.key_data(key), np.uint32)
                fseed = int(np.bitwise_xor.reduce(data.ravel())
                            ^ np.uint32(0 if seed is None else seed))
            try:
                return run_vals_fused(self, ntraj, seed=fseed)
            except FusedUnsupported:
                if engine == "fused":
                    raise
        elif engine == "fused":
            raise ValueError(
                "engine='fused' does not support return_states or mesh")
        if key is None:
            key = jax.random.PRNGKey(0 if seed is None else seed)
        m = resolve_traj_mesh(mesh)
        d = int(np.prod(m.devices.shape)) if m is not None else 1
        # pad the key batch so every chunk is a multiple of the device
        # count (sharding needs even splits); results are sliced back
        padded = -(-ntraj // d) * d
        keys = jax.random.split(key, padded)

        # reference_sqrt_born is baked into the trace (Born thresholds
        # in _exec) — a mid-session --reference-compat toggle must not
        # serve a stale program (same invariant as sharded._measure_qubits_fn)
        cache_key = (return_states, d, config.reference_sqrt_born)
        fn = getattr(self, "_fn_cache", {}).get(cache_key)
        if fn is None:
            def one(k, _rs=return_states):
                vals, planes = self._run_one(k)
                return (vals, planes) if _rs else (vals, 0)

            shard = {} if m is None else {
                "in_shardings": _traj_sharding(m)}
            fn = jax.jit(jax.vmap(one), **shard)
            if not hasattr(self, "_fn_cache"):
                self._fn_cache = {}
            # cache the jitted callable: rebuilding it per call would
            # retrace + recompile the WHOLE program every run_vals
            self._fn_cache[cache_key] = fn
        cap = self._MAX_LIVE if max_live_words is None else max_live_words
        per = max(1, cap // self._traj_live_cost())
        batch = max(d, min(padded, per * d) // d * d)
        chunks = []                            # per-shape jit cache: at most
        for lo in range(0, padded, batch):     # one extra compile for a tail
            chunks.append(fn(keys[lo:min(lo + batch, padded)]))
        vals = [np.concatenate([np.asarray(c[0][i])
                                for c in chunks])[:ntraj]
                for i in range(len(self.creg_names))]
        out = {c: v for c, v in zip(self.creg_names, vals)}
        if not return_states:
            return out
        states = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(
                [np.asarray(x) for x in xs])[:ntraj],
            *[c[1] for c in chunks])
        return out, states

    # -- Monte-Carlo observables --------------------------------------------

    def _expect_final(self, state, pauli: str):
        """Per-trajectory <P> on the final state (traced; engine hook)."""
        from ..ops.measure import _expectation_pair_body

        tr, ti = _expectation_pair_body(pauli, self.n, state, state)
        k = pauli.count("Y") % 4          # real part of (tr + i*ti) * i^k
        return (tr, -ti, -tr, ti)[k]

    def _mc_estimate(self, cache_key, one, ntraj: int, key, mesh=None):
        """Shared Monte-Carlo scaffolding: cached vmapped jit of
        ``one(key) -> scalar | (k,) vector`` of per-trajectory values,
        live-state batching, (mean, stderr) over trajectories — arrays
        when ``one`` is vector-valued. ``mesh`` shards the trajectory
        batch over devices (see :func:`resolve_traj_mesh`)."""
        m = resolve_traj_mesh(mesh)
        d = int(np.prod(m.devices.shape)) if m is not None else 1
        padded = -(-ntraj // d) * d
        keys = jax.random.split(key, padded)
        cache = getattr(self, "_efn_cache", None)
        if cache is None:
            cache = self._efn_cache = {}
        ck = (cache_key, d, config.reference_sqrt_born)
        fn = cache.get(ck)
        if fn is None:
            shard = {} if m is None else {"in_shardings": _traj_sharding(m)}
            fn = cache[ck] = jax.jit(jax.vmap(one), **shard)
        per = max(1, self._MAX_LIVE // self._traj_live_cost())
        batch = max(d, min(padded, per * d) // d * d)
        vals = np.concatenate([
            np.asarray(fn(keys[lo:min(lo + batch, padded)]))
            for lo in range(0, padded, batch)])[:ntraj]
        mean = vals.mean(axis=0)
        stderr = (vals.std(axis=0, ddof=1) / np.sqrt(ntraj) if ntraj > 1
                  else np.zeros_like(mean))
        return mean, stderr

    def expectation(self, pauli: str, ntraj: int, seed: int | None = None,
                    key=None, mesh=None):
        """Monte-Carlo ``<P>`` over ``ntraj`` noisy trajectories:
        returns ``(mean, stderr)``. The estimator is the trajectory
        average of the FINAL-state expectation — mid-circuit
        measurement and feed-forward run per trajectory exactly as in
        :meth:`run_vals`, so this is the physical noisy observable a
        hardware run would estimate (shot noise = stderr)."""
        from ..ops.measure import _check_pauli

        pauli = _check_pauli(pauli, self.n)
        if key is None:
            key = jax.random.PRNGKey(0 if seed is None else seed)

        def one(k, _p=pauli):
            _, state = self._run_one(k)
            return self._expect_final(state, _p)

        mean, stderr = self._mc_estimate(pauli, one, ntraj, key,
                                         mesh=mesh)
        return float(mean), float(stderr)

    def expectations(self, paulis, ntraj: int, seed: int | None = None,
                     key=None, mesh=None):
        """Monte-Carlo ``<P>`` for MANY Pauli strings in ONE program:
        all strings reduce on each trajectory's final state, so k
        observables cost one simulation instead of k. Returns a list of
        (mean, stderr) pairs in input order."""
        from ..ops.measure import _check_pauli

        paulis = tuple(_check_pauli(p, self.n) for p in paulis)
        if key is None:
            key = jax.random.PRNGKey(0 if seed is None else seed)

        def one(k, _ps=paulis):
            _, state = self._run_one(k)
            return jnp.stack([self._expect_final(state, p) for p in _ps])

        mean, stderr = self._mc_estimate(paulis, one, ntraj, key,
                                         mesh=mesh)
        return [(float(m), float(s)) for m, s in zip(mean, stderr)]

    def expectation_sum(self, terms, ntraj: int, seed: int | None = None,
                        key=None, mesh=None):
        """Monte-Carlo ``<H>`` for a Pauli-sum ``terms = [(coef, pauli),
        ...]`` over noisy trajectories: returns ``(mean, stderr)``. ALL
        terms reduce inside one traced program per trajectory (the
        per-trajectory energy), so the stderr is the shot noise of the
        energy itself — correlations between terms included."""
        from ..ops.measure import _check_pauli

        terms = tuple((float(c), _check_pauli(p, self.n)) for c, p in terms)
        if key is None:
            key = jax.random.PRNGKey(0 if seed is None else seed)

        def one(k, _t=terms):
            _, state = self._run_one(k)
            return sum(c * self._expect_final(state, p) for c, p in _t)

        mean, stderr = self._mc_estimate(terms, one, ntraj, key,
                                         mesh=mesh)
        return float(mean), float(stderr)

    def counts(self, ntraj: int, seed: int | None = None, key=None,
               mesh=None, engine: str = "vmap"):
        """Joint classical-register outcome histogram over trajectories:
        {"c=0110 d=1": count}, bits rendered LSB-first like the
        reference's CReg Show."""
        # subclasses override run_vals without the engine kwarg; thread
        # it through only for the dense program (where fused/auto mean
        # something) — "auto" on an MPS/stabilizer program is already at
        # its engine, "fused" there is the documented ValueError
        if engine == "fused" and type(self) is not TrajectoryProgram:
            raise ValueError(
                f"engine='fused' applies to the dense state-vector "
                f"engine, not {type(self).__name__}")
        kw = ({"engine": engine}
              if engine != "vmap" and type(self) is TrajectoryProgram
              else {})
        vals = self.run_vals(ntraj, seed=seed, key=key, mesh=mesh, **kw)
        rows = []
        for t in range(ntraj):
            parts = [f"{c}={CReg.of(vals[c][t])}" for c in self.creg_names]
            rows.append(" ".join(parts))
        return collections.Counter(rows)


class DensityProgram:
    """Exact open-system execution of a QASM program: the state is a
    vectorized density matrix on the SAME dense engine (2n-qubit planes,
    core/density.py), with the --noise channels applied exactly
    (rho -> sum K rho K^dag) instead of sampled. The exact counterpart
    of :class:`TrajectoryProgram` — same noise model, same placement —
    for n small enough that 4^n amplitudes fit (n <= ~14).

    Mid-circuit measurement samples ONE outcome per measure and projects
    rho (like hardware, one run); `--shots` then reads the exact final
    diagonal.
    """

    #: 2*n qubits ride the dense engine; past this 4^n planes don't fit.
    MAX_N = 14

    def __init__(self, ast, noise=None, mesh=None):
        from .compiler import elaborate

        (self.n, self.events, self.cregs0, self.layout,
         self.qreg_sizes) = elaborate(ast)
        #: device count for the mesh-sharded rho (parallel/density.py) —
        #: lifts the single-buffer n<=14 cap to what the mesh holds
        self.mesh = mesh
        if mesh is None and self.n > self.MAX_N:
            raise ValueError(
                f"--backend density stores 4^n amplitudes; n={self.n} > "
                f"{self.MAX_N}. Shard over a mesh (--mesh D) or use "
                f"--noise with --trajectories (sampled) instead.")
        if isinstance(noise, str):
            noise, ro = split_readout_spec(noise)
            if ro is not None:
                raise ValueError(
                    "readout error (ro:p) is a per-shot reporting flip; "
                    "the exact density backend has no shots to flip — "
                    "use trajectory mode")
        self.noise, self._tsets = _normalize_noise(
            noise, self.layout, self.qreg_sizes, self.n)

    def run(self, seed: int | None = None, dump_writer=None):
        from ..core.density import DensityMatrix
        from .compiler import EvCond, EvDump, EvGates, EvMeasure, EvReset

        dump_writer = dump_writer or (lambda s: None)
        key = jax.random.PRNGKey(0 if seed is None else seed)
        if not self.n:
            rho = None
        elif self.mesh is not None:
            from ..parallel.density import ShardedDensityMatrix
            from ..parallel.mesh import make_mesh

            rho = ShardedDensityMatrix(self.n, make_mesh(self.mesh))
        else:
            rho = DensityMatrix(self.n)
        cregs = dict(self.cregs0)

        def exec_events(events):
            nonlocal key
            for ev in events:
                if isinstance(ev, EvGates):
                    for p in ev.prims:
                        rho.apply([p])
                        for (_, ks, _), tset in zip(self.noise, self._tsets):
                            if np.asarray(ks[0]).shape[0] == 4:
                                t = tuple(int(q) for q in p.targets)
                                if len(t) == 2 and (tset is None
                                                    or set(t) <= tset):
                                    rho.apply_channel(ks, t)
                            else:
                                for q in p.targets:
                                    if tset is None or int(q) in tset:
                                        rho.apply_channel(ks, (int(q),))
                elif isinstance(ev, EvMeasure):
                    bits = []
                    for q in ev.qubits:
                        out, key = rho.measure_qubit(q, key)
                        bits.append(out)
                    off = 0
                    for creg, bit_index, count in ev.writes:
                        if bit_index is None:
                            cregs[creg] = CReg.of(bits[off:off + count])
                        else:
                            cregs[creg] = cregs[creg].set_bit(
                                bit_index, bits[off])
                        off += count
                elif isinstance(ev, EvReset):
                    for q in ev.qubits:
                        rho.reset(q)
                elif isinstance(ev, EvCond):
                    if cregs[ev.creg].to_natural() == ev.value:
                        exec_events(ev.body)
                elif isinstance(ev, EvDump):
                    dump_writer(self._pretty(rho, cregs))

        exec_events(self.events)
        return rho, cregs

    def _pretty(self, rho, cregs) -> str:
        out = ["Dump of the internal state (density backend): \n\n"]
        if rho is not None:
            name = "(x)".join(self.layout) if self.layout else ""
            noise = ", ".join(lbl for lbl, *_ in self.noise) or "none"
            out.append(f"Density matrix of {name}: {rho.n} qubits, "
                       f"trace={rho.trace():.6f}, purity={rho.purity():.6f}, "
                       f"noise={noise}\n")
            probs = rho.probs()
            for i, p in enumerate(probs):
                if p > 5e-7:
                    out.append(f"  |{format(i, f'0{rho.n}b')}>  p={p:.6f}\n")
        for reg in sorted(cregs):
            out.append(f"{reg}: {cregs[reg]}\n")
        out.append("\n")
        return "".join(out)
