"""Training-sequence packing: context-length chunking + remainder packing.

LLM pretraining consumes fixed-length token sequences; the standard
curation ending (T5's "pack", GPT-NeoX's `mmap` packing, HF
`group_texts`) splits each document into context-budget pieces and then
coalesces the sub-budget remainders so padding waste stays bounded. The
reference crawler stops at extraction; this is a north-rule LLM-tier
addition, downstream of dedup/quality in the same pipeline.

Semantics here (deliberately order-deterministic so a SQL oracle can
replay it bit-for-bit):

1. Each document yields ``ceil(n_tokens / budget)`` pieces; every piece
   is ``budget`` tokens except a final remainder.
2. A piece of exactly ``budget`` tokens is its own pack
   (``full-<doc>-<idx>``).
3. Remainder pieces pack per SOURCE in ``(doc_id, piece_idx)`` order by
   running-total next-fit: pack = ``floor(tokens_before / budget)`` —
   the same explicit-floor cumsum contract as ``sinks.compaction_plan``
   (a pack can overshoot by < budget; documented approximation, the
   windowed one-exchange shape is the point).

Scale shape: piece explosion is IN-ROW (sequence+explode inside
whole-stage codegen — no UDF, no shuffle); then exactly TWO keyed
exchanges — the per-source cumsum window and the per-pack stats window.
Source cardinality is the parallelism floor for the cumsum (a single
giant source serializes its window; real corpora shard by
source×date — pass that composite as ``source_col``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from crawler_spark.pipeline.textstats import token_count_expr


def sequence_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    budget: int,
) -> DataFrame:
    """``(source, id, piece_idx, piece_tokens, pack_id, pack_tokens,
    n_pack_pieces, pack_fill)`` — one row per training-sequence piece.

    ``pack_fill`` is ``pack_tokens / budget`` (ints in, ONE correctly
    rounded IEEE division out — deterministic cross-engine). Documents
    with zero tokens yield no pieces.
    """
    b = int(budget)
    pieces = (
        df.select(
            F.col(source_col).alias("source"),
            F.col(id_col).alias("_id"),
            token_count_expr(F.col(text_col)).alias("n"),
        )
        .filter(F.col("n") >= 1)
        .select(
            "source",
            "_id",
            "n",
            F.explode(
                # (n-1) div b = ceil(n/b) - 1: INTEGER division — no
                # double rounding, valid for any budget value
                F.sequence(F.lit(0), F.expr(f"(n - 1) div {b}").cast("int"))
            ).alias("piece_idx"),
        )
        .select(
            "source",
            "_id",
            "piece_idx",
            F.least(
                F.lit(b), F.col("n") - F.col("piece_idx") * b
            ).cast("long").alias("piece_tokens"),
        )
    )
    cum_w = (
        Window.partitionBy("source")
        .orderBy("_id", "piece_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rem_tokens = F.when(
        F.col("piece_tokens") < b, F.col("piece_tokens")
    ).otherwise(F.lit(0))
    packed = (
        pieces.withColumn(
            "_cum_rem",
            F.coalesce(F.sum(rem_tokens).over(cum_w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "pack_id",
            F.when(
                F.col("piece_tokens") == b,
                F.concat(
                    F.lit("full-"),
                    F.col("_id").cast("string"),
                    F.lit("-"),
                    F.col("piece_idx").cast("string"),
                ),
            ).otherwise(
                F.concat(
                    F.lit("rem-"),
                    F.col("source"),
                    F.lit("-"),
                    # INTEGER division — same explicit-floor contract as
                    # compaction_plan, no double rounding for any budget
                    F.expr(f"_cum_rem div {b}").cast("string"),
                )
            ),
        )
        .drop("_cum_rem")
    )
    pack_w = Window.partitionBy("pack_id")
    return packed.select(
        "source",
        F.col("_id").alias(id_col),
        F.col("piece_idx").cast("long").alias("piece_idx"),
        "piece_tokens",
        "pack_id",
        F.sum("piece_tokens").over(pack_w).cast("long").alias("pack_tokens"),
        F.count(F.lit(1)).over(pack_w).cast("long").alias("n_pack_pieces"),
        (F.sum("piece_tokens").over(pack_w).cast("double") / b).alias(
            "pack_fill"
        ),
    )
