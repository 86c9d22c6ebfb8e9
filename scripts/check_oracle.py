"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01; compare
row count, column set, and order-insensitive values (exact for
ints/strings, 1e-9 relative for floats). Usage: python scripts/check_oracle.py [names...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _dtype_kind(dt) -> str:
    """Coarse dtype class: the axis along which the driver's hash differs."""
    if np.issubdtype(dt, np.floating):
        return "float"
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.bool_):
        return "bool"
    return "other"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if len(a) != len(b):
        problems.append(f"rowcount spark={len(a)} duck={len(b)}")
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"columns spark={sorted(a.columns)} duck={sorted(b.columns)}")
    if problems:
        return problems
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        # Driver's value hash is dtype-sensitive: DuckDB HUGEINT -> pandas
        # float64 hashes differently from Spark's int64 even when every value
        # is numerically equal (r1 `sessionize` failure). Fail on a
        # kind-class mismatch so a driver hash failure always reproduces here.
        ka, kb = _dtype_kind(av.dtype), _dtype_kind(bv.dtype)
        if ka != kb:
            problems.append(
                f"dtype kind mismatch col {c}: spark={av.dtype}({ka}) "
                f"duck={bv.dtype}({kb}) — driver hash would fail"
            )
            continue
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            ok = np.allclose(
                av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True
            )
            exact = (av.astype(float).fillna(-1) == bv.astype(float).fillna(-1)).all()
            if not ok:
                bad = np.where(
                    ~np.isclose(av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-12)
                )[0][:3]
                problems.append(
                    f"float col {c} mismatch at rows {bad}: "
                    f"spark={av.iloc[bad].tolist()} duck={bv.iloc[bad].tolist()}"
                )
            elif not exact:
                problems.append(f"float col {c}: close but NOT bit-exact (hash would fail)")
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                bad = np.where(av.astype(str) != bv.astype(str))[0][:3]
                problems.append(
                    f"col {c} mismatch rows {bad}: spark={av.iloc[bad].tolist()} "
                    f"duck={bv.iloc[bad].tolist()}"
                )
    return problems


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(sdf)} rows")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {str(ex)[:300]}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(sdf)} rows match")
    # entry smoke
    if not only:
        edf = E.entry(spark).toPandas()
        print(f"ok   entry: {len(edf)} rows, cols={list(edf.columns)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
