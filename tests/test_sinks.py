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


def test_read_warc_parses_response_records(spark, tmp_path):
    """Synthetic 3-record WARC: warcinfo + request are dropped, the two
    responses parse to (url, warc_ts, html) with exact bodies — including
    a body that itself contains a blank line."""
    from crawler_spark.sources import read_warc

    def rec(wtype, uri, date, payload):
        h = f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
        if uri:
            h += f"WARC-Target-URI: {uri}\r\n"
        h += f"WARC-Date: {date}\r\nContent-Length: {len(payload)}\r\n\r\n"
        return h + payload + "\r\n\r\n"

    http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    body1 = "<html><body>hello</body></html>"
    body2 = "<html>first\r\n\r\nsecond</html>"  # blank line INSIDE body
    warc = (
        rec("warcinfo", None, "2024-01-01T00:00:00Z", "software: test")
        + rec("request", "http://a.com/x", "2024-01-02T03:04:05Z", "GET /x HTTP/1.1")
        + rec("response", "http://a.com/x", "2024-01-02T03:04:05Z", http + body1)
        + rec("response", "http://b.com/y", "2024-02-03T04:05:06Z", http + body2)
    )
    p = tmp_path / "test.warc"
    p.write_bytes(warc.encode())
    got = {r["url"]: (str(r["warc_ts"]), r["html"]) for r in read_warc(spark, str(p)).collect()}
    assert got == {
        "http://a.com/x": ("2024-01-02 03:04:05", body1),
        "http://b.com/y": ("2024-02-03 04:05:06", body2),
    }


def test_compaction_plan_next_fit_groups_and_one_exchange(spark):
    """Compaction planner: files pack per partition in (size desc, path)
    order; a file's group is floor(bytes-before-it / target) so groups
    cut when the running total crosses the target; single-file partitions
    get one group; and the whole plan rides ONE partition-keyed exchange
    (cumsum + group count as stacked frames)."""
    from crawler_spark.sinks import compaction_plan

    rows = [
        # partition A, target 100: sizes 70,40,40,30 in pack order
        ("A", "f1", 70), ("A", "f2", 40), ("A", "f3", 40), ("A", "f4", 30),
        # tie on size → path ascending breaks it
        ("B", "b2", 60), ("B", "b1", 60),
        ("C", "c1", 10),
    ]
    df = spark.createDataFrame(rows, "partition string, path string, size_bytes int")
    out = compaction_plan(df, target_bytes=100)
    # read the plan BEFORE execution: AQE's finalized plan prints the same
    # exchange again inside its materialized ShuffleQueryStage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    got = {r["path"]: (r["group_id"], r["n_groups"]) for r in out.collect()}
    # A: cum-before 0,70,110,150 → groups 0,0,1,1 (2 groups)
    assert got["f1"] == (0, 2) and got["f2"] == (0, 2)
    assert got["f3"] == (1, 2) and got["f4"] == (1, 2)
    # B: b1 packs first (path tiebreak): cum-before 0,60 → both group 0
    assert got["b1"] == (0, 1) and got["b2"] == (0, 1)
    assert got["c1"] == (0, 1)


def test_snapshot_retention_keep_last_and_daily(spark):
    from pyspark.sql import functions as F

    from crawler_spark.sinks import snapshot_retention_plan

    # 3 snapshots on the newest day, then one per day going back
    rows = [(i, f"2001-07-{30-i:02d} 12:00:00") for i in range(10)]
    rows += [(100, "2001-07-30 13:00:00"), (101, "2001-07-30 14:00:00")]
    rows += [(200, "1995-01-01 00:00:00")]  # ancient: expired
    df = spark.createDataFrame(rows, ["snapshot_id", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    out = {
        r["snapshot_id"]: r
        for r in snapshot_retention_plan(
            df, keep_last=5, keep_daily_days=180, now="2001-07-31"
        ).collect()
    }
    # global rank: 101 newest, then 100, then 0 (all 2001-07-30), then 1...
    assert out[101]["rn"] == 1 and out[101]["keep"]
    assert out[101]["is_daily_keeper"]  # newest of its day
    assert not out[100]["is_daily_keeper"]  # same day, older
    assert out[100]["keep"]  # but inside keep_last=5
    # rank 6+ survive only via daily-keeper within the window
    assert out[4]["rn"] == 7 and not out[4]["is_recent_keeper"]
    assert out[4]["is_daily_keeper"] and out[4]["keep"]
    # ancient snapshot: outside window, not recent -> expired
    assert not out[200]["keep"]
