#!/usr/bin/env python
"""spark-submit entry point: run the check suite over a sequence table.

Production invocation (north rule):

    spark-submit --py-files pyanomalydetector_spark.zip \
        tools/run_suite_job.py \
        --input  <path or table of (doc_id, tokens, n_tok, source)> \
        --state  <checkpoint dir>          # optional: resumable run \
        --output <verdicts/violations dir> # optional: parquet sinks \
        --report <report.json path>        # optional: driver-side report

The job builds the default suite (allowed sources discovered from the data
unless --allowed is given), runs it — through the checkpoint store when
--state is set (skip-done partitions, pinned baselines, lineage rows) — and
writes verdicts/violations + a JSON report. Exit code 1 if any check failed
(cron-friendly, like the reference's detect_anomalies.py CLI).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="parquet path of sequences")
    p.add_argument("--state", help="checkpoint store dir (enables resume)")
    p.add_argument("--output", help="dir for verdicts/ violations/ parquet")
    p.add_argument("--report", help="write JSON report here")
    p.add_argument("--allowed", nargs="*",
                   help="allowed source values (default: discovered via regex)")
    p.add_argument("--allowed-regex", default="^src[0-9]+$")
    args = p.parse_args(argv)

    # spark-submit provides the session config (master, executors, --py-files)
    spark = SparkSession.builder.appName("seqcheck-suite").getOrCreate()

    from pyanomalydetector_spark.checks.core import run_checks, default_suite
    from pyanomalydetector_spark.plans.report import report_json
    from pyanomalydetector_spark.plans.checkpoint import (
        CheckpointStore, run_with_checkpoint, snapshot_id_for_dir,
    )

    seq = spark.read.parquet(args.input)
    allowed = args.allowed or sorted(
        r["source"] for r in seq.select("source").distinct()
        .filter(F.col("source").rlike(args.allowed_regex)).collect())
    suite = default_suite(allowed)

    if args.state:
        store = CheckpointStore(spark, args.state)
        snap = snapshot_id_for_dir(args.input)
        res = run_with_checkpoint(seq, suite, store, snapshot_id=snap)
    else:
        res = run_checks(seq, suite)

    if args.output:
        res.verdicts.write.mode("overwrite").parquet(args.output + "/verdicts")
        res.violations.write.mode("overwrite").parquet(args.output + "/violations")

    rep = report_json(res.verdicts, res.violations, path=args.report)
    print(json.dumps({"all_passed": rep["all_passed"],
                      "partitions": len(rep["partitions"]),
                      "violations_by_check": rep["violations_by_check"]}))
    return 0 if rep["all_passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
