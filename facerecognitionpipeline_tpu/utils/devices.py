"""Bounded device-backend probing.

A downed device tunnel can make JAX backend init hang indefinitely
(observed on this rig: axon init blocked 25 min before erroring
UNAVAILABLE). Probing `jax.devices()` in a subprocess under a timeout
keeps the CALLING process clear of the hung init so it can fail fast
(bench.py) or fall back to a virtual CPU mesh (__graft_entry__).
"""

from __future__ import annotations

import os
import subprocess
import sys


def probe_device_count(
    timeout_s: float = 180.0, cwd: str | None = None
) -> tuple[int, list[str]]:
    """(device count, diagnostic lines). Count 0 means init failed or timed
    out; diagnostics carry the last stderr line or the timeout notice.

    Normal init is seconds even through a slow tunnel, so generous timeouts
    never trip on a healthy backend.
    """
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            cwd=cwd or os.getcwd(),
        )
        out = probe.stdout.strip().splitlines()
        if probe.returncode == 0 and out:
            try:
                return int(out[-1]), []
            except ValueError:
                pass
        return 0, probe.stderr.strip().splitlines()[-1:]
    except subprocess.TimeoutExpired:
        return 0, [f"backend init exceeded {timeout_s:.0f}s watchdog"]
