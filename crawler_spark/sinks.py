"""Output sinks — the CSVDataStorage contract, Spark-native.

Reference: ``NewCSVDataStorage.Persist`` drains the collector and writes
one CSV file with a header row of the field names, flushing every 100
rows (/root/reference/storage.go:23-44, 9, 36-40). Semantics to keep:

* the output schema is the ordered field-name list → header=True;
* every value is a string (``FieldValues []string``, collector.go:13) →
  all columns are cast to string on write, so the file is byte-stable
  regardless of upstream column types;
* append-only, no ordering guarantee (result order is fetch-completion
  order, SURVEY §3) → distributed part-files are fine; the incremental
  100-row flush is an artifact of the single-writer design and is
  subsumed by Spark's per-task streaming CSV writers.

Scale note: one CSV *file* is a single-writer bottleneck; the default
here is a part-file directory (each task streams its own file). Pass
``single_file=True`` only for small, reference-parity outputs — it
coalesces to one partition by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: storage.go:38-40 flushes every 100 rows; kept as documentation only.
REFERENCE_FLUSH_ROWS = 100


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """Write ``df`` as header CSV with every column cast to string
    (storage.go's all-strings row model)."""
    out = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    if single_file:
        out = out.coalesce(1)
    out.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a :func:`write_csv` directory back: header on, all columns
    string (no inference — the reference data model is string-typed)."""
    return (
        spark.read.option("header", True).option("inferSchema", False).csv(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar ORC sink (typed, unlike the all-strings CSV contract) —
    the third interchange format next to parquet and JSONL. ORC keeps
    column statistics per stripe, so downstream predicate pushdown works
    the same as parquet's."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC directory; schema travels with the file (no inference
    pass, no declared schema needed — unlike JSONL)."""
    return spark.read.orc(path)
