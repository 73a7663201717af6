"""Host-calibration probe kernels — the SINGLE definition every harness uses.

Cross-tool host-normalization (bench.py's ``probe_sec``/``shuffle_probe_sec``,
tools/scaling_bench.py's per-rung brackets, tools/scaling_pairs.sh) only works
if all of them run byte-identical kernels; these used to be copy-pasted in
three places with docstring claims of equivalence keeping them in sync.
Tuning a constant here (row count, partition count, modulus) retunes every
consumer at once — which is the point.

Both kernels are engine-independent: no repo operator appears in either plan,
so engine changes cannot move them — only host state can. They calibrate two
DIFFERENT host dimensions (measured round 5, BASELINE.md): this VM's stall
windows hit the shuffle/memory path while the pure-ALU kernel stays nominal,
so a query delta must beat BOTH probes to count as an engine delta.
"""
from __future__ import annotations

import time


def cpu_probe(spark) -> float:
    """Pure-CPU host-ceiling kernel: a whole-stage-codegen xxhash-sum over
    ``range`` — near-zero memory traffic, no shuffle (the single partial-agg
    exchange moves one row per task). Returns wall seconds."""
    from pyspark.sql import functions as F
    t0 = time.perf_counter()
    (spark.range(0, 2_000_000_000, 1, 128)
          .select(F.xxhash64("id").alias("h"))
          .select(F.sum(F.pmod("h", F.lit(997)))).collect())
    return round(time.perf_counter() - t0, 4)


def shuffle_probe(spark) -> float:
    """Shuffle/memory-bandwidth kernel: 30M rows with UNIQUE keys
    (xxhash64 of id), so map-side combine cannot shrink the exchange and
    every row crosses the shuffle. Returns wall seconds."""
    from pyspark.sql import functions as F
    t0 = time.perf_counter()
    (spark.range(0, 30_000_000, 1, 64)
          .select(F.xxhash64("id").alias("k"), F.col("id").alias("v"))
          .groupBy("k").agg(F.sum("v").alias("s"))
          .select(F.sum("s")).collect())
    return round(time.perf_counter() - t0, 4)
