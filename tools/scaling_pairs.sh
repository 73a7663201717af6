#!/bin/bash
# Round-5 scaling-evidence protocol (the shape BENCH_SCALING.json reports):
#
#   1. full 32M ladder — one clean JVM per rung (tools/scaling_bench.py
#      --run child mode), min-of-2 samples, pure-CPU probe BEFORE and AFTER
#      each rung (host-window calibration);
#   2. 103M same-window criterion pairs — the N->4N rule is a RATIO, so
#      local[1] and local[4] are measured back-to-back in one host window
#      (probe bracketing discloses that window's ceiling);
#   3. the 0.1B-row local[32] point (min-of-2).
#
# Usage: tools/scaling_pairs.sh [logfile]   (default /tmp/r05_ladder.log)
# Compose BENCH_SCALING.json from the log afterwards (the per-round
# composer keeps every raw reading; see BASELINE.md "scaling evidence").
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r05_ladder.log}
: > "$LOG"

probe() {
  # both calibration kernels, one JVM: pure-ALU (host CPU ceiling) and
  # unique-key shuffle (memory/shuffle-bandwidth ceiling — the dimension
  # this VM's stall windows actually hit; see BASELINE.md round 5).
  # Kernels are the SHARED definitions in pyanomalydetector_spark/probes.py
  # (same ones bench.py and scaling_bench.py run) — never inline a copy.
  python - "$1" <<'PY' 2>/dev/null
import sys
sys.path.insert(0, ".")
from pyanomalydetector_spark.session import get_spark
from pyanomalydetector_spark.probes import cpu_probe, shuffle_probe
cores = int(sys.argv[1])
s = get_spark("probe", master=f"local[{cores}]"); s.range(1000).count()
print(f"PROBE cores={cores} sec={cpu_probe(s):.2f}")
print(f"SPROBE cores={cores} sec={shuffle_probe(s):.2f}")
s.stop()
PY
}

run() {
  python tools/scaling_bench.py --run "$1" "$2" 2>/dev/null | tail -1 | \
    python -c "import json,sys;d=json.loads(sys.stdin.read());print(f'RUN cores=$1 nrows={d[\"n_rows\"]} sec={d[\"sec\"]:.2f}')"
}

echo "=== 32M ladder (2 samples per rung, probe per rung) ===" >> "$LOG"
for c in 1 4 8 32; do
  probe $c >> "$LOG"; run $c 32000000 >> "$LOG"
  run $c 32000000 >> "$LOG"; probe $c >> "$LOG"
done

echo "=== generate 103M ===" >> "$LOG"
python - <<'PY' 2>/dev/null >> "$LOG"
import sys, os
sys.path.insert(0, "tools"); sys.path.insert(0, ".")
import scaling_bench as sb
sb.N_ROWS = 100000000
sb.DATA = os.path.abspath("data/scalebench/seq_100000000.parquet")
if not os.path.isdir(sb.DATA):
    sb.generate(100000000)
print("GEN done")
PY

echo "=== 103M same-window pair #1 (probe,1,4,probe) ===" >> "$LOG"
probe 1 >> "$LOG"; run 1 100000000 >> "$LOG"
probe 4 >> "$LOG"; run 4 100000000 >> "$LOG"

echo "=== 0.1B local[32] point x2 ===" >> "$LOG"
probe 32 >> "$LOG"; run 32 100000000 >> "$LOG"
run 32 100000000 >> "$LOG"; probe 32 >> "$LOG"

echo "=== 103M same-window pair #2 ===" >> "$LOG"
probe 1 >> "$LOG"; run 1 100000000 >> "$LOG"
probe 4 >> "$LOG"; run 4 100000000 >> "$LOG"

# Optional big-scale section (BIG=1): the 0.2B fixture's criterion pair,
# the 8->32 driver-example rung, the 0.2B local[32] point, and the 0.4B
# local[32] point (third doubling, ~30 GB parquet). These produced the
# criterion_pairs_202M / pair_8_to_32_202M / point_0_2B / point_0_4B
# entries in BENCH_SCALING.json.
if [ "${BIG:-0}" = "1" ]; then
  for n in 200000000 400000000; do
    python - "$n" <<'PY' 2>/dev/null >> "$LOG"
import sys, os
sys.path.insert(0, "tools"); sys.path.insert(0, ".")
import scaling_bench as sb
n = int(sys.argv[1])
sb.N_ROWS = n
sb.DATA = os.path.abspath(f"data/scalebench/seq_{n}.parquet")
if not os.path.isdir(sb.DATA):
    sb.generate(n)
print(f"GEN {n} done")
PY
  done
  echo "=== 202M same-window 1->4 pair ===" >> "$LOG"
  probe 1 >> "$LOG"; run 1 200000000 >> "$LOG"
  probe 4 >> "$LOG"; run 4 200000000 >> "$LOG"; probe 4 >> "$LOG"
  echo "=== 202M same-window 8->32 pair ===" >> "$LOG"
  probe 8 >> "$LOG"; run 8 200000000 >> "$LOG"; run 8 200000000 >> "$LOG"
  probe 8 >> "$LOG"; probe 32 >> "$LOG"
  run 32 200000000 >> "$LOG"; run 32 200000000 >> "$LOG"; probe 32 >> "$LOG"
  echo "=== 0.4B local[32] point x2 ===" >> "$LOG"
  probe 32 >> "$LOG"; run 32 400000000 >> "$LOG"
  run 32 400000000 >> "$LOG"; probe 32 >> "$LOG"
fi
echo "ALL DONE" >> "$LOG"
