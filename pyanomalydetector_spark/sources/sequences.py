"""Deterministic synthesis of the pre-tokenized training-sequence table.

The engine's primary input (BASELINE.json ``input_hint``) is an Iceberg table of
pre-tokenized training sequences::

    (doc_id: string, tokens: array<int32>, n_tok: int32, source: string)

In production that table is ingested upstream; here we synthesize it
deterministically (pure hashlib, no RNG) from the driver-provided
``documents.parquet`` so that BOTH the Spark engine and the DuckDB oracle read
the exact same parquet bytes — token-array equality (the per-row invariant) is
then checkable bit-for-bit.

Tokenization: each whitespace word maps to ``int(md5(word)[:8], 16) % VOCAB``
(a stable, platform-independent token id). Deterministic fixture defects are
injected so each check has non-trivial violations:

- every doc with ``doc_id % 97 == 0``  → an exact duplicate row (uniqueness);
- every doc with ``doc_id % 131 == 0`` → ``source`` rewritten to
  ``src_unknown`` (referential);
- every doc with ``doc_id % 113 == 0`` → ``n_tok`` off by +1 (metadata
  consistency / token invariant).

Reference analog: the frozen CSV fixture snapshots under
/root/reference/testdata/csv/ with pinned ``endep`` (tests/test_detector_all.py:20-53).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

VOCAB_SIZE = 50257  # GPT-2-ish vocabulary size
DUP_MOD = 97
BAD_SOURCE_MOD = 131
BAD_NTOK_MOD = 113
BAD_SOURCE = "src_unknown"

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "data", "sequences")


def token_id(word: str) -> int:
    """Stable token id: first 8 hex chars of md5, mod vocab size."""
    return int(hashlib.md5(word.encode("utf-8")).hexdigest()[:8], 16) % VOCAB_SIZE


def sequences_parquet_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return os.path.join(_CACHE_ROOT, f"{tag}.parquet")


def synthesize_sequences(sf_dir: str, force: bool = False) -> str:
    """Materialize the sequence table for ``sf_dir``; returns the parquet path.

    Pure-Python and fully deterministic (md5-keyed, no seeds), so repeated runs
    and both query engines agree byte-for-byte.
    """
    out_path = sequences_parquet_path(sf_dir)
    if os.path.exists(out_path) and not force:
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "source"])
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    sources = docs.column("source").to_pylist()

    out_doc_id: list[str] = []
    out_tokens: list[list[int]] = []
    out_n_tok: list[int] = []
    out_source: list[str] = []

    def emit(did: int, toks: list[int], n_tok: int, source: str) -> None:
        out_doc_id.append(f"doc-{did:08d}")
        out_tokens.append(toks)
        out_n_tok.append(n_tok)
        out_source.append(source)

    for did, text, source in zip(doc_ids, texts, sources):
        toks = [token_id(w) for w in text.split(" ")]
        n_tok = len(toks)
        if did % BAD_NTOK_MOD == 0:
            n_tok += 1  # metadata-consistency defect
        if did % BAD_SOURCE_MOD == 0:
            source = BAD_SOURCE  # referential defect
        emit(did, toks, n_tok, source)
        if did % DUP_MOD == 0:
            emit(did, toks, n_tok, source)  # uniqueness defect

    table = pa.table({
        "doc_id": pa.array(out_doc_id, type=pa.string()),
        "tokens": pa.array(out_tokens, type=pa.list_(pa.int32())),
        "n_tok": pa.array(out_n_tok, type=pa.int32()),
        "source": pa.array(out_source, type=pa.string()),
    })
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out_path)
    return out_path


def load_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load (synthesizing if needed) the sequence table as a DataFrame.

    At production scale this is ``spark.read.table("iceberg.db.sequences")``
    partitioned by ``source`` + ``bucket(doc_id)`` so per-partition checks
    prune at the scan.
    """
    return spark.read.parquet(synthesize_sequences(sf_dir))


SEQ_SCHEMA = ("doc_id string, tokens array<int>, n_tok int, source string")


def sequences_jsonl_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return os.path.join(_CACHE_ROOT, f"{tag}.jsonl")


def synthesize_sequences_jsonl(sf_dir: str, force: bool = False) -> str:
    """JSON-lines mirror of the sequence table (same rows as the parquet) —
    the ingest-format path: raw corpus drops usually arrive as JSONL, and
    both engines read the same text bytes (DuckDB ``read_json``)."""
    import json as _json

    out_path = sequences_jsonl_path(sf_dir)
    if os.path.exists(out_path) and not force:
        return out_path
    table = pq.read_table(synthesize_sequences(sf_dir))
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        for row in table.to_pylist():
            f.write(_json.dumps(row, separators=(",", ":")) + "\n")
    os.replace(tmp, out_path)
    return out_path


def load_sequences_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence table through the JSON-lines source with an EXPLICIT schema
    (never schema inference — one pass saved, stable types). Must be
    row-identical to the parquet path (pinned by
    tests/test_checks.py::test_jsonl_source_equals_parquet_source)."""
    return spark.read.schema(SEQ_SCHEMA).json(synthesize_sequences_jsonl(sf_dir))
