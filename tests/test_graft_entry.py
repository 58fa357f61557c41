"""Regression tests for the driver entry points (__graft_entry__.py).

The driver calls dryrun_multichip(8) from a process whose JAX backend may
already be initialized with 1 device (the axon TPU plugin) — rounds 1 and
2 both failed exactly there (`MULTICHIP_r0{1,2}.json`: "need 8 devices,
have 1"). These tests reproduce that init state in subprocesses and assert
the dry run still passes via its scrubbed-subprocess fallback.

Reference capability at stake: parallel frame-range script evaluation,
/root/reference/src/main.cpp:981-985.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_overrides: dict) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=1200,
    )


def test_dryrun_survives_preinitialized_one_device_backend():
    """The round-2 burn: jax.devices() called BEFORE dryrun_multichip, on a
    backend pinned to exactly 1 device. The in-process config updates
    cannot widen it; the dry run must detect the shortfall and re-exec in
    a scrubbed subprocess."""
    proc = _run(
        "import jax\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n",
        {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "PYTHONPATH": REPO,
        },
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "re-exec in scrubbed subprocess" in proc.stdout
    assert "triclinic cell sharded eval ok" in proc.stdout


def test_dryrun_clean_interpreter_runs_in_process():
    """From a clean interpreter the config path works and no subprocess is
    spawned (fast path)."""
    proc = _run(
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n",
        {"JAX_PLATFORMS": "cpu", "XLA_FLAGS": "", "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "re-exec" not in proc.stdout
    assert "triclinic cell sharded eval ok" in proc.stdout


def test_ensure_devices_reports_truthfully():
    """_ensure_devices must return False (not silently 'succeed') when the
    visible device count stays below n."""
    proc = _run(
        "import jax; jax.devices()\n"
        "import __graft_entry__ as g\n"
        "assert g._ensure_devices(8) is False\n"
        "print('TRUTHFUL')\n",
        {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "PYTHONPATH": REPO,
        },
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "TRUTHFUL" in proc.stdout
