"""Device characterization + mitigation: the full bring-up protocol stack.

One runnable pass over the protocols a hardware lab runs on a new device —
driven here against a KNOWN noise model so every number has an analytic
answer to check off:

1. **Randomized benchmarking** under 1q depolarizing(p): the survival
   decay must fit alpha = 1 - 4p/3 exactly, r = 2p/3.
2. **Interleaved RB** of a specific Clifford carrying its own extra
   channel: r_G = (1 - alpha1*alpha2)/2.
3. **Quantum volume** at widths 2..4: noiseless HOP ~ (1+ln2)/2 ~ 0.85
   (passes), strong 2q depolarizing drives HOP to ~1/2 (fails).
4. **Zero-noise extrapolation** of <ZZ> on a noisy GHZ pair: the raw
   value is visibly damaged; exponential-fit ZNE recovers 1.0.
5. **Process tomography** of the depolarizing channel itself: the
   reconstructed Choi matches the analytic Kraus Choi, and the process
   fidelity vs identity reads exactly 1 - p.
6. **Amplitude estimation (MLAE)**: a = P(good) of a W-state prep,
   recovered to ~1e-3 from a 7-point Grover-power schedule.

Run: python examples/device_characterization.py          (CPU: ~1 min)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from qubism_tpu.core.density import depolarizing, depolarizing2  # noqa: E402
from qubism_tpu.models import (  # noqa: E402
    irb_experiment,
    mlae_estimate,
    qv_experiment,
    rb_experiment,
    zne_expectation,
)
from qubism_tpu.models.circuits import ghz_prims, w_state_prims  # noqa: E402
from qubism_tpu.models.tomography import (  # noqa: E402
    choi_from_kraus,
    process_fidelity,
    process_tomography,
)


def main():
    p = 0.02

    print("== 1. randomized benchmarking (depolarizing p=%.3f) ==" % p)
    ms, surv, alpha, r = rb_experiment(1, depolarizing(p), ms=(1, 2, 4, 8, 16),
                                       n_seq=4, seed=0)
    print("   survivals:", [round(s, 4) for s in surv])
    print(f"   fitted alpha={alpha:.6f} (analytic {1 - 4 * p / 3:.6f}), "
          f"r={r:.6f} (analytic {2 * p / 3:.6f})")
    assert abs(alpha - (1 - 4 * p / 3)) < 1e-6

    print("== 2. interleaved RB (gate carries extra depolarizing 0.04) ==")
    a_ref, a_int, r_gate = irb_experiment(1, gate_idx=5, kraus=depolarizing(p),
                                          gate_kraus=depolarizing(0.04),
                                          ms=(1, 2, 4), n_seq=3, seed=1)
    print(f"   alpha_ref={a_ref:.6f} alpha_int={a_int:.6f} r_gate={r_gate:.6f}")

    print("== 3. quantum volume ==")
    clean = qv_experiment(m=4, n_circuits=12, seed=2)
    noisy = qv_experiment(m=4, n_circuits=12, seed=2,
                          kraus2=depolarizing2(0.4))
    print(f"   noiseless: HOP={clean.hop_mean:.3f} -> passed={clean.passed} "
          f"(QV={clean.quantum_volume})")
    print(f"   depolarized: HOP={noisy.hop_mean:.3f} -> passed={noisy.passed}")
    assert clean.passed and not noisy.passed

    print("== 4. zero-noise extrapolation of GHZ <ZZ> ==")
    est, vals = zne_expectation(ghz_prims(2), 2, "ZZ",
                                kraus1=depolarizing(0.03),
                                kraus2=depolarizing2(0.05),
                                scales=(1, 3, 5), method="exp")
    print("   raw <ZZ> per fold scale:", [round(v, 4) for v in vals])
    print(f"   ZNE estimate: {est:.5f} (ideal 1.0)")
    assert abs(est - 1.0) < 0.01

    print("== 5. process tomography of depolarizing(0.2) ==")
    kraus = depolarizing(0.2)
    choi = process_tomography(lambda rho: rho.apply_channel(kraus, (0,)), 1)
    err = np.linalg.norm(choi - choi_from_kraus(kraus))
    f_id = process_fidelity(choi, np.eye(2))
    print(f"   ||Choi - analytic|| = {err:.2e}; F_pro(vs I) = {f_id:.4f} "
          f"(analytic 0.8000)")
    assert err < 1e-5 and abs(f_id - 0.8) < 1e-5

    print("== 6. MLAE amplitude estimation on a W-state prep ==")
    n = 6
    good = tuple(1 << (n - 1 - k) for k in range(2))  # two W components
    res = mlae_estimate(w_state_prims(n), n, good, shots=256, seed=4)
    print(f"   a_exact={res.a_exact:.6f} a_hat={res.a_hat:.6f} "
          f"({res.queries} oracle queries)")
    assert abs(res.a_hat - res.a_exact) < 0.01

    print("all characterization protocols verified.")


if __name__ == "__main__":
    main()
