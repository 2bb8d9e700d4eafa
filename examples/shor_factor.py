"""Factor a small semiprime with Shor's algorithm.

The order-finding core is quantum phase estimation over the
modular-multiplication permutation U_a |x> = |a x mod N>, run on the
compiled engine; continued fractions decode the sampled phases, and the
classical wrapper turns an even order into a factor pair.

Run:  python examples/shor_factor.py [N]   (default 15)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from qubism_tpu.models.shor import estimate_order, shor_factor


def main(n: int = 15) -> None:
    p, q = shor_factor(n, seed=1, t=9 if n > 15 else None)
    print(f"{n} = {p} x {q}")
    assert p * q == n and 1 < p < n

    r = estimate_order(7 % n if n % 7 else 2, n, t=9)
    print(f"(order-finding subroutine sanity: r = {r})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
