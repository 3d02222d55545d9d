"""Static-analysis tier as a test (reference: tests/lint_run.sh)."""

import subprocess
import sys
import os


def test_lint_clean():
    script = os.path.join(os.path.dirname(__file__), "lint_run.py")
    proc = subprocess.run([sys.executable, script],
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stdout
