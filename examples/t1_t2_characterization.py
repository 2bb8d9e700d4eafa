"""T1 / T2 noise characterization: the experiment every hardware lab runs.

Drives the damping channels + Monte-Carlo observables surface end to end:

* **T1 (energy relaxation)** — excite the qubit, idle k rounds under
  amplitude damping `ad:gamma` (each idle is a gate, so the noise model
  attaches one decay site to it), read <Z>. Excited population decays as
  (1-gamma)^(k+1) (the +1 is the noisy X prep), so
  <Z>(k) = 1 - 2(1-gamma)^(k+1) and T1 = -1/ln(1-gamma) idle rounds.
* **T2 (Ramsey dephasing)** — H to |+>, idle k rounds under phase
  damping `pd:gamma`, read <X>. Off-diagonals shrink by sqrt(1-gamma)
  per site: <X>(k) = (1-gamma)^((k+1)/2), T2 = -2/ln(1-gamma) rounds.

Three estimates of the same curve agree: the Monte-Carlo trajectory
estimator (what a hardware run gives, with shot noise = stderr), the
exact density matrix, and the analytic law. The printed fit recovers
gamma from the trajectory data alone by a log-linear regression —
exactly how a lab extracts T1 from decay counts.

Run: python examples/t1_t2_characterization.py          (CPU: seconds)
"""

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from qubism_tpu.qasm.parser import parse_openqasm  # noqa: E402
from qubism_tpu.run.noisy import DensityProgram, TrajectoryProgram  # noqa: E402

PI = "3.141592653589793"
HALF_PI = "1.5707963267948966"


def idle_program(prep: str, k: int) -> str:
    """``prep`` then k idle rounds (U(0,0,0) is identity, but a gate —
    the --noise model attaches one damping site to each)."""
    lines = [f"qreg q[1];", prep] + ["U(0, 0, 0) q[0];"] * k
    return "\n".join(lines)


def decay_curve(prep: str, pauli: str, spec: str, ks, ntraj=4096, seed=0):
    """(trajectory mean, stderr, exact density value) per idle count."""
    rows = []
    for k in ks:
        src = idle_program(prep, k)
        ast = parse_openqasm("<t1t2>", src)
        mean, err = TrajectoryProgram(ast, noise=spec).expectation(
            pauli, ntraj, seed=seed + k)
        rho, _ = DensityProgram(parse_openqasm("<t1t2>", src),
                                noise=spec).run(seed=0)
        rows.append((float(mean), float(err), float(rho.expectation(pauli))))
    return rows


def fit_gamma(ks, values, power: float) -> float:
    """gamma from log-linear regression of values ~ (1-gamma)^(power*(k+1))."""
    ks = np.asarray(ks, dtype=float)
    y = np.log(np.clip(np.asarray(values, dtype=float), 1e-9, None))
    slope = np.polyfit(power * (ks + 1), y, 1)[0]
    return 1.0 - math.exp(slope)


def main():
    gamma = 0.08
    ks = [0, 2, 4, 8, 12, 16, 24]

    print(f"== T1 (amplitude damping ad:{gamma}) ==")
    print(f"{'idles':>5} {'<Z> traj':>10} {'stderr':>8} {'exact':>8} "
          f"{'analytic':>9}")
    excited = []
    for k, (mean, err, exact) in zip(ks, decay_curve(
            f"U({PI}, 0, {PI}) q[0];", "Z", f"ad:{gamma}", ks)):
        analytic = 1.0 - 2.0 * (1.0 - gamma) ** (k + 1)
        assert abs(mean - exact) < 5 * err + 1e-3
        assert abs(exact - analytic) < 1e-5
        excited.append((1.0 - mean) / 2.0)          # p1 from <Z>
        print(f"{k:>5} {mean:>10.4f} {err:>8.4f} {exact:>8.4f} "
              f"{analytic:>9.4f}")
    g1 = fit_gamma(ks, excited, 1.0)
    t1 = -1.0 / math.log(1.0 - g1)
    print(f"fitted gamma = {g1:.4f} (true {gamma}), "
          f"T1 = {t1:.2f} idle rounds\n")
    assert abs(g1 - gamma) < 0.01

    print(f"== T2 Ramsey (phase damping pd:{gamma}) ==")
    print(f"{'idles':>5} {'<X> traj':>10} {'stderr':>8} {'exact':>8} "
          f"{'analytic':>9}")
    coh = []
    for k, (mean, err, exact) in zip(ks, decay_curve(
            f"U({HALF_PI}, 0, {PI}) q[0];", "X", f"pd:{gamma}", ks)):
        analytic = (1.0 - gamma) ** ((k + 1) / 2.0)
        assert abs(mean - exact) < 5 * err + 1e-3
        assert abs(exact - analytic) < 1e-5
        coh.append(mean)
        print(f"{k:>5} {mean:>10.4f} {err:>8.4f} {exact:>8.4f} "
              f"{analytic:>9.4f}")
    g2 = fit_gamma(ks, coh, 0.5)
    t2 = -2.0 / math.log(1.0 - g2)
    print(f"fitted gamma = {g2:.4f} (true {gamma}), "
          f"T2 = {t2:.2f} idle rounds")
    assert abs(g2 - gamma) < 0.02


if __name__ == "__main__":
    main()
