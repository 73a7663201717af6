"""pyanomalydetector_spark — a from-scratch PySpark-native constraint-validation
engine with the query/data-processing capabilities of toku463ne/pyAnomalyDetector.

Not a port: the reference (pandas/numpy/PostgreSQL, see /root/reference) defines
WHAT is computed — per-item sufficient statistics, z-score threshold cascades
(detect1..detect4), declarative per-item conditions, two-stage DBSCAN grouping,
and incremental watermark/checkpoint machinery. This package re-expresses those
semantics as declarative Spark DataFrame plans (Catalyst-optimized, whole-stage
codegen, AQE) over columnar tables, scaled for a multi-executor cluster:

- ``sources``    — schema-pinned parquet loaders + deterministic synthesis of the
                   pre-tokenized sequence table (doc_id, tokens, n_tok, source).
- ``functions``  — sufficient-stats aggregates (Bessel std with the reference's
                   inf/NaN scrub), Welford pandas-UDAF variant, portable hashing.
- ``operators``  — detect1/2/3 cascade, tumbling rollups, grid resampling,
                   min-max normalization, top-N, declarative conditions,
                   dedup (exact/minhash/simhash/ngram/embedding), similarity
                   search, text analysis, multimodal plumbing.
- ``checks``     — the check-suite engine: column_stats / zscore_threshold /
                   unique / referential / n_tok consistency / drift (PSI+KS) /
                   token invariant → verdicts + violations DataFrames, with a
                   resumable checkpoint table carrying per-partition lineage.
- ``clustering`` — numpy DBSCAN + the reference's two-stage Jaccard→correlation
                   grouping of violating partitions.
- ``streaming``  — Structured Streaming variants of the rollup/stats pipeline.
"""

__version__ = "0.1.0"
