"""Streaming-native operators: watermarked windowed rollups + keyed state.

The reference has no event time (bounded channels only — SURVEY.md §2.4
"Streaming" row); these operators are the streaming half our engine needs
once the crawl runs against an unbounded page feed:

- :func:`hourly_host_rollup_stream` — fetch-rate-per-host over event-time
  windows with a watermark, the standard late-data answer (a page whose
  ``warc_ts`` lags the watermark past the delay is dropped, not
  double-counted into a finalized window).
- :func:`stateful_host_budget` — a LIFETIME per-host crawl cap enforced
  across micro-batches via ``applyInPandasWithState``. The per-round
  politeness window (frontier/politeness.py) cannot express this: a
  window function sees one round, keyed state survives all of them.

Both come with batch twins so tests can assert stream == batch on the
same finite input (availableNow).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def hourly_host_rollup(
    df: DataFrame, ts_col: str = "warc_ts", key_col: str = "host"
) -> DataFrame:
    """Batch twin of the streaming rollup: pages/hour per host."""
    return (
        df.groupBy(
            F.window(F.col(ts_col), "1 hour").alias("win"), F.col(key_col)
        )
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col(key_col).alias("host"),
            "n_pages",
        )
    )


def hourly_host_rollup_stream(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "host",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed page counts per host with a watermark.

    Append output mode emits a (window, host) row once the watermark
    passes the window end — late pages inside the delay still count,
    later ones are dropped. State size is bounded by
    (#hosts × watermark/window) — the watermark is what makes a
    10^10-page unbounded feed feasible; without it window state grows
    forever.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 hour").alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col(key_col).alias("host"),
            "n_pages",
        )
    )


_BUDGET_OUT = StructType(
    [
        StructField("host", StringType()),
        StructField("url_canon", StringType()),
        StructField("priority", IntegerType()),
        StructField("seq", LongType()),
    ]
)

_BUDGET_STATE = StructType([StructField("used", LongType())])


def stateful_host_budget(stream_df: DataFrame, total_cap: int) -> DataFrame:
    """Admit at most ``total_cap`` urls per host over the stream's LIFETIME.

    ``applyInPandasWithState`` keeps one long per host (urls already
    admitted); each micro-batch admits its ``(priority, seq)``-smallest
    rows up to the remainder. Deterministic given the batch boundaries:
    admission order within a batch is a data property, and the state is a
    pure fold over batches. Arrow-batched — no per-row Python.

    Input: streaming DF with (host, url_canon, priority, seq).
    """

    def admit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        used = state.get[0] if state.exists else 0
        remaining = total_cap - used
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["priority", "seq"], kind="mergesort")
        take = batch.iloc[: max(remaining, 0)]
        state.update((used + len(take),))
        if len(take):
            yield take[["host", "url_canon", "priority", "seq"]]

    return (
        stream_df.groupBy("host")
        .applyInPandasWithState(
            admit,
            outputStructType=_BUDGET_OUT,
            stateStructType=_BUDGET_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def url_dedup_stream(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "url_canon",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming URL-seen dedup: emit each canonical URL's FIRST arrival,
    dropping re-fetches that land within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` is the streaming twin of the batch
    seen anti-join (frontier/seen.py): state for a key is kept only until
    the watermark passes its arrival + delay, so state size is bounded by
    the horizon's traffic — not by crawl lifetime (the unbounded-lifetime
    cap is the batch seen table / Bloom; this operator is the in-flight
    tier that stops duplicate fetches *within* a horizon at stream speed).
    A duplicate later than the horizon re-emits — by design: the batch
    layer owns forever-dedup, the stream layer owns burst-dedup.
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )


def host_budget_tws(
    stream_df: DataFrame,
    budget: int = 5,
    key_col: str = "host",
) -> DataFrame:
    """Lifetime per-host crawl cap on Spark 4's ``transformWithStateInPandas``
    — the successor API to ``applyInPandasWithState`` (same semantics as
    :func:`stateful_host_budget`, which stays as the compatibility twin).

    Why the new API matters at scale: typed state handles (ValueState /
    ListState / MapState) are individually addressable in the state store
    — a processor can read ONE counter without deserializing a whole blob
    — and per-state TTL is declarative (``getValueState(ttlDurationMs=…)``
    would expire idle hosts without a cleanup pass; unset here because a
    lifetime cap must never forget).

    Emits rows admitted under the cap, with their lifetime sequence
    number; order within a micro-batch group follows (priority, seq) like
    the batch politeness window.

    Environment requirements (gated, not assumed): the TWS driver worker
    needs ``google.protobuf`` on the Python path, and the query needs the
    RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass =
    …state.RocksDBStateStoreProvider``). Where either is absent (e.g.
    this sandbox lacks protobuf), use :func:`stateful_host_budget` — same
    semantics on the stable applyInPandasWithState API.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        f"{key_col} string, url_canon string, priority int, seq long, "
        "lifetime_rank long"
    )

    class HostBudget(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n_admitted", "n long")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            taken = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                if taken >= budget:
                    break
                pdf = pdf.sort_values(["priority", "seq"], kind="mergesort")
                room = budget - taken
                out = pdf.head(room).copy()
                out["lifetime_rank"] = range(taken + 1, taken + len(out) + 1)
                taken += len(out)
                if len(out):
                    yield out
            self._n.update((taken,))

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=HostBudget(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )


def fetch_parse_stream_join(
    fetches: DataFrame,
    parses: DataFrame,
    horizon: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: each parse event matched to
    the fetch that produced it, within ``horizon``.

    ``(url, fetch_ts)`` ⋈ ``(url, parse_ts)`` with the range condition
    ``fetch_ts <= parse_ts <= fetch_ts + horizon``. Both sides carry a
    watermark AND the join condition bounds event time in BOTH directions —
    that pair is what lets the state store evict: a buffered fetch row is
    dropped once the parse-side watermark passes ``fetch_ts + horizon``, so
    state is O(rate × horizon), never O(stream). Without the range bound
    the join would be correct but its state unbounded — the difference
    between a demo and something that survives a 10^10-URL feed.

    Output: ``(url, fetch_ts, parse_ts, latency_sec)``, append mode.
    """
    f = fetches.select("url", "fetch_ts").withWatermark("fetch_ts", horizon)
    p = parses.select(
        F.col("url").alias("p_url"), "parse_ts"
    ).withWatermark("parse_ts", horizon)
    return f.join(
        p,
        (F.col("url") == F.col("p_url"))
        & (F.col("parse_ts") >= F.col("fetch_ts"))
        & (F.col("parse_ts") <= F.col("fetch_ts") + F.expr(f"interval {horizon}")),
        "inner",
    ).select(
        "url",
        "fetch_ts",
        "parse_ts",
        (F.unix_timestamp("parse_ts") - F.unix_timestamp("fetch_ts")).alias("latency_sec"),
    )
