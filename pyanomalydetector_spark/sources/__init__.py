from pyanomalydetector_spark.sources.tables import load_table, TABLE_NAMES
from pyanomalydetector_spark.sources.sequences import (
    load_sequences,
    sequences_parquet_path,
    synthesize_sequences,
)

__all__ = [
    "load_table",
    "TABLE_NAMES",
    "load_sequences",
    "sequences_parquet_path",
    "synthesize_sequences",
]
