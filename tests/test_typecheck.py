"""Static type tier as a test (reference CI ran mypy; see
tests/typecheck_run.py for what is enforced)."""

import os
import subprocess
import sys


def test_typecheck_clean():
    script = os.path.join(os.path.dirname(__file__), "typecheck_run.py")
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True,
        env=env, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
