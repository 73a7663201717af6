#!/usr/bin/env python
"""Package the engine and smoke-run it through real spark-submit --py-files.

Builds pyanomalydetector_spark.zip (the --py-files artifact), then invokes
the actual spark-submit binary on tools/run_suite_job.py against the sf0.001
sequence table — proving the production deployment path end-to-end.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "pyanomalydetector_spark.zip")
    pkg = os.path.join(_REPO, "pyanomalydetector_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _REPO))
    return zpath


def main() -> int:
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark
        spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                    "bin", "spark-submit")

    with tempfile.TemporaryDirectory(prefix="submit_smoke_") as tmp:
        zpath = build_zip(tmp)
        # synthesize the input via the repo checkout (driver-side only)
        sys.path.insert(0, _REPO)
        from pyanomalydetector_spark.sources.sequences import synthesize_sequences
        seq_path = synthesize_sequences("/root/testdata/sf0.001")

        cmd = [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zpath,
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.ui.enabled=false",
            os.path.join(_REPO, "tools", "run_suite_job.py"),
            "--input", seq_path,
            "--state", os.path.join(tmp, "state"),
            "--output", os.path.join(tmp, "out"),
            "--report", os.path.join(tmp, "report.json"),
        ]
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
        tail = "\n".join(proc.stdout.splitlines()[-3:])
        print(tail)
        # exit 1 from the job means checks failed (fixture defects!) — the
        # deployment path worked iff the report exists and parsed
        with open(os.path.join(tmp, "report.json")) as f:
            rep = json.load(f)
        ok = (not rep["all_passed"]
              and rep["violations_by_check"].get("unique_doc_id", 0) > 0
              and os.path.isdir(os.path.join(tmp, "out", "verdicts")))
        print("SUBMIT_SMOKE", "OK" if ok else "FAIL")
        if not ok:
            print(proc.stderr[-3000:])
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
