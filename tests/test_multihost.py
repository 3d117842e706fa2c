"""Multi-process (simulated multi-host) execution: the jax.distributed
handshake + a global-mesh GSPMD decode step across 2 processes
(experiments/multihost_dryrun.py). Validates the code path the
single-process virtual-device dryrun cannot: cross-process device
enumeration, process-local placement, collectives over the process
boundary."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_decode_step():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "experiments", "multihost_dryrun.py")],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert out.stdout.count("multihost step ok=True") >= 1, out.stdout
