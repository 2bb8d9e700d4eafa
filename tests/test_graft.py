"""Driver-contract checks for __graft_entry__.py.

``dryrun_multichip`` must work *the way the driver calls it*: in a process
whose jax backend is already initialized with a single device and whose
environment does NOT carry conftest's virtual-device forcing. Round 1 only
tested it under conftest's env, which hid a driver failure
(MULTICHIP_r01.json ok=false) — hence the subprocess tests here.
"""

import os
import subprocess
import sys

import jax
import pytest


def _run_driver_like(code, env):
    """Run a driver-contract subprocess; SKIP (don't fail) when the
    interpreter cannot even start: the axon sitecustomize dials the
    relay at process startup, so a wedged relay hangs EVERY new python
    (zero CPU in register()) — an environment outage, not a code bug."""
    try:
        return subprocess.run(
            [sys.executable, "-c", code], env=env, cwd=REPO,
            capture_output=True, text=True, timeout=600)
    except subprocess.TimeoutExpired:
        pytest.skip("driver-like subprocess did not finish in 600 s — "
                    "axon relay outage (new interpreters hang at startup); "
                    "environment, not code")

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    re, im = out
    assert re.shape == (1 << 10,)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def _driver_like_env() -> dict:
    """Single-CPU-device env with no virtual-device forcing (driver-like)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # keep the test off the real TPU tunnel
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.slow
def test_dryrun_self_provisions_like_driver():
    """Backend already initialized with 1 device -> dryrun must still pass."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        "assert jax.device_count() == 1, jax.devices()\n"  # backend now locked in
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRIVER-LIKE DRYRUN OK')\n"
    ) % REPO
    res = _run_driver_like(code, _driver_like_env())
    assert res.returncode == 0 and "DRIVER-LIKE DRYRUN OK" in res.stdout, (
        f"rc={res.returncode}\nstdout: {res.stdout[-2000:]}\nstderr: {res.stderr[-2000:]}"
    )


@pytest.mark.slow
def test_dryrun_does_not_pin_parent_to_cpu():
    """Fresh process: the dryrun must succeed via the subprocess virtual
    mesh WITHOUT forcing the parent's backend to CPU (a real multi-chip
    process must keep validating real ICI collectives, and a driver that
    benches after the dryrun must keep its TPU)."""
    code = (
        "import sys, os; sys.path.insert(0, %r)\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "flags = os.environ.get('XLA_FLAGS', '')\n"
        "assert 'xla_force_host_platform_device_count' not in flags, flags\n"
        "import jax\n"
        "assert jax.device_count() == 1, jax.devices()  # parent untouched\n"
        "print('INPROC DRYRUN OK')\n"
    ) % REPO
    res = _run_driver_like(code, _driver_like_env())
    assert res.returncode == 0 and "INPROC DRYRUN OK" in res.stdout, (
        f"rc={res.returncode}\nstdout: {res.stdout[-2000:]}\nstderr: {res.stderr[-2000:]}"
    )
