"""Driver-fidelity test for __graft_entry__.dryrun_multichip.

Round 1 failed the driver's MULTICHIP check because the driver invokes
``dryrun_multichip(8)`` in an environment where jax exposes a single real
device (``JAX_PLATFORMS=axon``), and the entry crashed reshaping 1 device
into a (4, 2) mesh. This test runs the entry in a **fresh subprocess with
the driver's default environment** — no conftest CPU forcing — so the
entry's own self-sufficiency (re-exec onto a virtual CPU mesh) is what is
being tested.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_in_default_env():
    env = dict(os.environ)
    # Undo the conftest's CPU forcing: restore the image default so the
    # subprocess sees exactly what the driver sees.
    env["JAX_PLATFORMS"] = "axon"
    env.pop("_GRAFT_DRYRUN_CPU_DEVICES", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip(8): ok" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_forced_cpu_subprocess():
    """The cheap variant: invoke with 8 devices from a 1-ish device env by
    forcing the marker path directly (no axon tunnel involved)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ""
    env["_GRAFT_DRYRUN_CPU_DEVICES"] = "8"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip(8): ok" in proc.stdout
