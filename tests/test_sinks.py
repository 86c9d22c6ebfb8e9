"""CSV sink (reference S6, storage.go:23-44) + cosine near-dup pairs."""

import math

import pyspark.sql.functions as F

from crawler_spark.pipeline.similarity import cosine_near_dups
from crawler_spark.sinks import read_csv, write_csv


def test_csv_roundtrip_all_strings(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 3.5), (2, "beta", -0.25), (3, "gamma", 11.0)],
        "id int, name string, score double",
    )
    path = str(tmp_path / "out")
    write_csv(df, path)
    back = read_csv(spark, path)
    # header preserved, every column read back as string (reference's
    # FieldValues []string model)
    assert back.columns == ["id", "name", "score"]
    assert all(f.dataType.typeName() == "string" for f in back.schema.fields)
    rows = {r["id"]: (r["name"], r["score"]) for r in back.collect()}
    assert rows == {"1": ("alpha", "3.5"), "2": ("beta", "-0.25"), "3": ("gamma", "11.0")}


def test_csv_single_file(spark, tmp_path):
    df = spark.range(100).select(F.col("id").cast("string").alias("id"))
    path = str(tmp_path / "single")
    write_csv(df, path, single_file=True)
    parts = [p for p in (tmp_path / "single").iterdir() if p.name.startswith("part-")]
    assert len(parts) == 1
    assert read_csv(spark, path).count() == 100


def test_cosine_near_dups_matches_numpy(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.95, 0.05]),  # near 2
        (4, [-1.0, 0.0, 0.0]),  # anti-parallel to 0/1
    ]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_near_dups(df, threshold=0.8).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    want = {}
    for i, (ia, va) in enumerate(vecs):
        for ib, vb in vecs[i + 1:]:
            c = round(cos(va, vb), 6)
            if c >= 0.8:
                want[(ia, ib)] = c
    assert set(got) == set(want) == {(0, 1), (2, 3)}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6
