"""The production deployment path: real spark-submit --py-files."""

import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_smoke():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_smoke.py")],
        capture_output=True, text=True, timeout=600)
    assert "SUBMIT_SMOKE OK" in proc.stdout, proc.stdout + proc.stderr[-2000:]
