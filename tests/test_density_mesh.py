"""Mesh-sharded density matrices (parallel/density.py, VERDICT r4 item
4): the vectorized rho on ShardedSim must match the dense single-buffer
DensityMatrix on every surface, and lindblad_evolve must integrate on it
unchanged — pinned against the dense integrator, the n<=7 Liouvillian
behavior it already pins, and the MCWF unraveling."""

import numpy as np
import pytest

from qubism_tpu.core.density import (DensityMatrix, amplitude_damping,
                                     depolarizing, depolarizing2)
from qubism_tpu.core.gates import Prim
from qubism_tpu.parallel.density import ShardedDensityMatrix
from qubism_tpu.parallel.mesh import make_mesh

_X = np.array([[0, 1], [1, 0]], dtype=complex)
_SM = np.array([[0, 1], [0, 0]], dtype=complex)


def _rand_u(k, rng):
    a = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(
        size=(1 << k, 1 << k))
    q, _ = np.linalg.qr(a)
    return q


@pytest.fixture
def pair():
    n = 4
    return (ShardedDensityMatrix(n, make_mesh(8)), DensityMatrix(n))


def test_unitaries_and_channels_match_dense(pair):
    rs, rd = pair
    rng = np.random.default_rng(3)
    prims = [Prim(_rand_u(1, rng), (0,)), Prim(_rand_u(2, rng), (1, 3)),
             Prim(np.array([1, 1j, 1, -1]), (0, 2), diag=True),
             Prim(_rand_u(1, rng), (2,))]
    rs.apply(prims)
    rd.apply(prims)
    for ch, tg in ((depolarizing(0.1), 1), (amplitude_damping(0.3), (3,)),
                   (depolarizing2(0.2), (0, 2))):
        rs.apply_channel(ch, tg)
        rd.apply_channel(ch, tg)
    assert abs(rs.trace() - rd.trace()) < 1e-5
    assert abs(rs.purity() - rd.purity()) < 1e-5
    assert np.abs(rs.probs() - rd.probs()).max() < 1e-5
    for p in ("ZIII", "XYIZ", "IXXI", "YZXZ", "IIII"):
        assert abs(rs.expectation(p) - rd.expectation(p)) < 1e-5, p
    assert abs(rs.prob_one(1) - rd.prob_one(1)) < 1e-5
    assert abs(rs.expectation_sum([(0.5, "ZIII"), (-0.2, "IXXI")])
               - rd.expectation_sum([(0.5, "ZIII"), (-0.2, "IXXI")])) < 1e-5


def test_gathers_respect_relabeling():
    """A channel on a device-bit qubit forces a relabel swap; the
    index-gather readouts must translate through sim.perm."""
    rs2, rd2 = ShardedDensityMatrix(4, make_mesh(8)), DensityMatrix(4)
    rng = np.random.default_rng(9)
    prims = [Prim(_rand_u(1, rng), (q,)) for q in range(4)]
    rs2.apply(prims)
    rd2.apply(prims)
    rs2.apply_channel(amplitude_damping(0.4), 0)   # row q0 AND col q4
    rd2.apply_channel(amplitude_damping(0.4), 0)
    assert rs2.sim.perm != list(range(8))          # swap actually happened
    assert np.abs(rs2.probs() - rd2.probs()).max() < 1e-5
    for p in ("ZIII", "XIII", "YZIX"):
        assert abs(rs2.expectation(p) - rd2.expectation(p)) < 1e-5, p


def test_reset_projection_semantics(pair):
    rs, rd = pair
    h = (np.array([[1, 1], [1, -1]]) / np.sqrt(2)).astype(complex)
    prims = [Prim(h, (0,)), Prim(np.eye(4, dtype=complex)[[0, 1, 3, 2]],
                                 (0, 1))]
    rs.apply(prims).reset(0)
    rd.apply(prims).reset(0)
    assert np.abs(rs.probs() - rd.probs()).max() < 1e-5
    assert abs(rs.trace() - 1.0) < 1e-5


def test_lindblad_evolve_on_mesh_matches_dense():
    from qubism_tpu.models.dynamics import lindblad_evolve

    n = 3
    h = [(0.7, "XII"), (0.4, "ZZI"), (0.3, "IXZ")]
    collapse = [(0.5, _SM, 0), (0.3, _SM, 2)]
    obs = ["ZII", "IIZ", "XII"]
    prep = [Prim(_X, (q,)) for q in (0, 2)]
    rd = DensityMatrix(n).apply(prep)
    rs = ShardedDensityMatrix(n, make_mesh(8)).apply(prep)
    _, vd = lindblad_evolve(rd, h, collapse, t=0.8, steps=16,
                            observables=obs)
    rs, vs = lindblad_evolve(rs, h, collapse, t=0.8, steps=16,
                             observables=obs)
    assert np.abs(np.asarray(vd) - np.asarray(vs)).max() < 2e-5
    assert abs(rs.trace() - 1.0) < 1e-5     # exact CPTP factors


def test_lindblad_mesh_vs_mcwf():
    from qubism_tpu.models.dynamics import lindblad_evolve, lindblad_mcwf

    n = 2
    h = [(0.6, "XI"), (0.35, "ZZ")]
    collapse = [(0.4, _SM, 1)]
    obs = ["ZI", "IZ"]
    prep = [Prim(_X, (0,)), Prim(_X, (1,))]
    rs = ShardedDensityMatrix(n, make_mesh(4)).apply(prep)
    _, vs = lindblad_evolve(rs, h, collapse, t=1.0, steps=20,
                            observables=obs)
    _, est = lindblad_mcwf(n, prep, h, collapse, t=1.0, steps=20,
                           ntraj=600, observables=obs, seed=1)
    for j, (m, se) in enumerate(est):
        assert abs(m - vs[-1][j]) < 5 * se + 0.02, (obs[j], m, vs[-1][j])


def test_rejects_oversized_local_block():
    # 1 device, n=16 -> 32 local qubits > LOCAL_MAX: must refuse clearly
    with pytest.raises(ValueError, match="single-buffer"):
        ShardedDensityMatrix(16, make_mesh(1), allocate=False)


def test_density_backend_mesh_cli_matches_dense(tmp_path, capsys):
    """--backend density --mesh D runs the full QASM program (gates,
    targeted channels, mid-circuit measurement) on the sharded rho and
    must reproduce the dense backend's dump and observables at a seed."""
    from qubism_tpu.cli import eval_file

    f = tmp_path / "d.qasm"
    f.write_text(
        "qreg q[3]; creg c[1];\n"
        "U(1.5707963267948966, 0, 3.141592653589793) q[0];\n"
        "CX q[0], q[1];\n"
        "U(0.7, 0.2, 0.4) q[2];\n"
        "measure q[2] -> c[0];\n")
    outs = []
    for mesh in (None, 8):
        rc = eval_file(str(f), seed=4, backend="density",
                       noise="dep:0.05,ad:0.1@q[2]", dump_state=True,
                       observables=("ZZI", "IXI"), mesh=mesh)
        assert rc == 0
        outs.append(capsys.readouterr().out)
    da = [x for x in outs[0].splitlines() if x.startswith("  |")]
    db = [x for x in outs[1].splitlines() if x.startswith("  |")]
    assert len(da) == len(db) > 2
    for la, lb in zip(da, db):
        assert abs(float(la.split("p=")[1]) - float(lb.split("p=")[1])) < 2e-5
    oa = [x for x in outs[0].splitlines() if x.startswith("<")]
    ob = [x for x in outs[1].splitlines() if x.startswith("<")]
    assert oa == ob != []


def test_density_program_mesh_lifts_cap():
    """n > 14 is refused dense but accepted with a mesh (allocation is
    deferred to run(); construction must validate, not allocate)."""
    import pytest as _pytest

    from qubism_tpu.qasm.parser import parse_openqasm
    from qubism_tpu.run.noisy import DensityProgram

    src = "qreg q[16];\n"
    ast = parse_openqasm("<t>", src)
    with _pytest.raises(ValueError, match="mesh"):
        DensityProgram(ast)
    DensityProgram(ast, mesh=8)    # constructs fine; run() would shard
