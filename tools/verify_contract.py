"""Driver-contract simulation: run entry() + every queries() entry at sf0.01,
run the matching oracle_sql() in DuckDB over the same tables, and compare
row-count, column names, and order-insensitive values (like the round driver).

Usage: python tools/verify_contract.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".") or "0"
    if isinstance(v, int):
        return str(v)
    return str(v)


def canon(rows, cols):
    out = []
    for row in rows:
        d = dict(zip(cols, row))
        out.append(tuple(norm_cell(d[c]) for c in sorted(cols)))
    return sorted(out)


_INT_SPARK = {"byte", "short", "int", "integer", "long", "bigint"}


def _kind_spark(dt: str) -> str:
    dt = dt.lower()
    if dt in _INT_SPARK:
        return "int"
    if dt in ("float", "double"):
        return "float"
    return "other"


def _kind_pandas(dtype) -> str:
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    return "other"


def type_kind_mismatches(sdf, odf):
    """Columns where Spark yields an integer type but the oracle arrives in
    pandas as float (or vice versa). This is the driver's failure mode that
    lossy float-normalisation hides: DuckDB promotes SUM(INTEGER) to HUGEINT,
    pandas has no int128, so .df() lands float64 while Spark emits BIGINT —
    values identical, driver hash red (seq_packing_stats, rounds 2-4).
    Fix on the oracle side: CAST every integer aggregate to BIGINT.
    """
    spark_kinds = {f.name: _kind_spark(f.dataType.simpleString())
                   for f in sdf.schema.fields}
    bad = []
    for c in odf.columns:
        sk, ok = spark_kinds.get(c, "other"), _kind_pandas(odf[c].dtype)
        if {sk, ok} == {"int", "float"}:
            bad.append((c, sk, ok))
    return bad


def main() -> int:
    import __spark_entry__ as e
    from pyanomalydetector_spark.session import get_spark

    spark = get_spark(app_name="verify-contract", master="local[8]",
                      shuffle_partitions="16")

    print("== entry() smoke (sf0.001) ==")
    df = e.entry(spark)
    n = df.count()
    print(f"entry rows={n} schema={df.schema.simpleString()}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:36s} rows={len(srows):6d}  (rows-only, no oracle)")
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        # second execution purely for pandas-dtype kinds (the driver pulls
        # the oracle through .df(), which is where HUGEINT -> float64 bites)
        odf = con.execute(oracles[name]).df()
        ok_cols = sorted(scols) == sorted(ocols)
        s_canon, o_canon = canon(srows, scols), canon(orows, ocols)
        ok_vals = s_canon == o_canon
        kind_bad = type_kind_mismatches(sdf, odf)
        ok_kinds = not kind_bad
        status = "OK" if (ok_cols and ok_vals and ok_kinds) else "MISMATCH"
        print(f"{name:36s} rows={len(srows):6d}/{len(orows):6d} cols={'OK' if ok_cols else f'{scols} vs {ocols}'} values={'OK' if ok_vals else 'DIFF'} kinds={'OK' if ok_kinds else kind_bad}  -> {status}")
        if not (ok_cols and ok_vals and ok_kinds):
            failures.append(name)
        if not (ok_cols and ok_vals):
            for i, (a, b) in enumerate(zip(s_canon, o_canon)):
                if a != b:
                    print(f"   first diff @{i}:\n    spark : {a}\n    oracle: {b}")
                    break
            if len(s_canon) != len(o_canon):
                print(f"   row count diff: spark={len(s_canon)} oracle={len(o_canon)}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
