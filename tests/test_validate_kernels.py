"""The kernel-compile validation tool must stay green in interpret mode
(it is the pre-bench gate on hardware; rot here means a blind TPU run)."""

import os
import subprocess
import sys

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def test_validate_kernels_interpret():
    env = dict(os.environ, PPL_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "validate_kernels.py"),
         "--interpret"],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr[-2000:]
    assert "ALL OK" in proc.stdout
