"""Deduplication families: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Everything here is deterministic and *portable*: token/shingle hashes are
derived from md5 (not engine-internal hash functions), so the DuckDB oracle
in ``__spark_entry__.oracle_sql`` reproduces every signature bit-for-bit.
All hot paths are built-in Column expressions (whole-stage codegen); there
is no Python UDF anywhere in this module.

Scale design (the 100 TB story):

* exact dedup — one shuffle keyed on the md5 fingerprint; uniformly
  distributed by construction → no skew. Map-side partial aggregation
  (``groupBy.agg(min, count)``) keeps shuffle bytes ∝ distinct keys.
* MinHash — signatures are computed with ONE shuffle: explode shingles,
  then a single groupBy(doc) with K min-aggregates (map-side combine
  shrinks each task's output to one row per doc per partition).
  LSH banding then buckets by (band_id, band_hash) — ~uniform buckets —
  and candidate pairs are generated per-bucket, never across the corpus.
* SimHash — same one-shuffle shape with B conditional-sum aggregates.
* n-gram Jaccard — pair generation via an equi-join on shingle (the only
  quadratic risk); the join key is a shingle hash, and ultra-hot shingles
  (stopword bigrams) are exactly the keys AQE skew-split handles; the
  ``min_common`` prefilter drops pairs before the expensive ratio math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# 60-bit hash space: 15 hex digits always fit a signed 64-bit int, in both
# Spark (conv→cast) and DuckDB ('0x…'::BIGINT) — the portability contract.
HASH_BITS = 60
_MERSENNE_P = (1 << 61) - 1  # prime > 2^60, for the affine MinHash family


def md5h60(c: Column) -> Column:
    """Portable 60-bit hash of a string column (first 15 hex digits of md5).

    Used instead of ``xxhash64`` wherever a SQL oracle must reproduce the
    value. The crawl path (no oracle requirement) uses ``F.xxhash64`` which
    is cheaper; both are uniform, which is all the bucketing needs.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def shingles_expr(text: Column, n: int = 2) -> Column:
    """Distinct word n-grams of lowercased text, as strings.

    Built from the token array with ``transform`` + ``slice`` — stays
    JVM-side. Distinct because Jaccard/MinHash are set semantics.
    """
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    # guard: sequence(1, x<1) is DESCENDING in Spark → would feed slice a
    # 0/negative start; docs shorter than n grams have no shingles at all
    return F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism — but
    ONLY when the frame is narrower than that. The shingle stage is
    CPU-bound (tokenize + n-gram per row), so its parallelism is capped by
    its INPUT partitioning, and a scan of one small parquet file (or one
    row group) yields one task: 31 of 32 cores idle. At 100 TB the corpus
    has thousands of row groups and this is a no-op; on an
    under-partitioned source it is the difference between 1× and N×. The
    gate keeps well-partitioned inputs shuffle-free."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 2) -> DataFrame:
    """(id, shingle) rows — the shared first stage of every near-dup family.

    The input is ``spread()`` first: every consumer of this frame is
    CPU-bound on the explode, which cannot parallelize beyond the source
    partitioning."""
    return spread(df).select(
        F.col(id_col), F.explode(shingles_expr(F.col(text_col), n)).alias("shingle")
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, id_col: str, fingerprint: Column) -> DataFrame:
    """Duplicate groups by content fingerprint: one row per distinct content,
    ``keeper_id`` = min id, ``n_copies`` = multiplicity.

    One shuffle on the fingerprint; partial aggregation means shuffle volume
    is one row per (task, distinct fingerprint) — at 100 TB this is the
    cheapest possible exact dedup.
    """
    return (
        df.select(F.col(id_col).alias("_id"), fingerprint.alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_keep_first(df: DataFrame, id_col: str, fingerprint: Column) -> DataFrame:
    """The deduplicated corpus itself: keep the min-id row per fingerprint.

    ``min_by(whole_row, id)`` rather than a row_number window: the
    aggregate gets map-side partial aggregation (duplicate rows collapse
    to one candidate per task before the exchange) and never SORTS within
    fingerprint partitions — on a boilerplate-heavy crawl where one page
    body has 10^6 captures, the window form sorts them all, the aggregate
    form ships at most one per task. One shuffle, no second scan.
    """
    cols = df.columns
    return (
        df.withColumn("_fp", fingerprint)
        .groupBy("_fp")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_m"))
        .select([F.col(f"_m.{c}").alias(c) for c in cols])
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _perm_params(n_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic affine-permutation family h_i(x) = (a_i·x + b_i) mod p.

    Parameters come from a fixed LCG on the seed (NOT random per run):
    identical in the SQL oracle, identical across resumed jobs.
    """
    params: list[tuple[int, int]] = []
    state = seed
    for _ in range(n_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_MERSENNE_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE_P
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16, ngram: int = 2,
    seed: int = 7,
) -> DataFrame:
    """MinHash signature per document: columns ``mh0..mh{K-1}``.

    ONE shuffle: explode shingles → groupBy(doc) with K ``min`` aggregates.
    The affine family runs on the portable 60-bit shingle hash; arithmetic
    is done in DECIMAL(38,0) to avoid 64-bit overflow identically in Spark
    and DuckDB (a·x can exceed 2^63).
    """
    # project the md5-derived hash ONCE per shingle before the groupBy —
    # as K separate aggregate inputs it would be re-evaluated K times per
    # row (subexpression elimination does not span aggregate buffers)
    ex = exploded_shingles(df, id_col, text_col, ngram).select(
        F.col(id_col), md5h60(F.col("shingle")).cast("decimal(38,0)").alias("_h60")
    )
    h = F.col("_h60")
    aggs = []
    for i, (a, b) in enumerate(_perm_params(n_hashes, seed)):
        perm = (h * F.lit(a).cast("decimal(38,0)") + F.lit(b).cast("decimal(38,0)")) % F.lit(
            _MERSENNE_P
        ).cast("decimal(38,0)")
        aggs.append(F.min(perm.cast("long")).alias(f"mh{i}"))
    return ex.groupBy(F.col(id_col)).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, n_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a pair.

    Band key = md5 of the concatenated band values → uniform bucket ids.
    Pair generation is a per-bucket self-join (equi-join on band key), so
    cost is Σ bucket² — bounded because true duplicates are rare and the band
    hash is uniform; a runaway bucket (pathological corpus) is AQE-skew-
    split. Output: distinct (id_a < id_b) candidate pairs.
    """
    rows_per_band = n_hashes // bands
    # one explode, not a B-arm union: union arms each re-run the signature
    # FINAL aggregate (exchange reuse only covers the map side), and the
    # self-join below would double that again (CLAUDE.md plan-shape rules)
    entries = []
    for bidx in range(bands):
        cols = [F.col(f"mh{bidx * rows_per_band + r}") for r in range(rows_per_band)]
        key = F.md5(F.concat_ws("_", F.lit(str(bidx)), *[c.cast("string") for c in cols]))
        entries.append(F.struct(F.lit(bidx).alias("band"), key.alias("bkey")))
    banded = sig.select(
        F.col(id_col).alias("doc"), F.explode(F.array(*entries)).alias("e")
    ).select("doc", F.col("e.band").alias("band"), F.col("e.bkey").alias("bkey"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, ["band", "bkey"])
        .filter(F.col("l.doc") < F.col("r.doc"))
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .distinct()
    )


def minhash_similarity(sig: DataFrame, pairs: DataFrame, n_hashes: int = 16) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of equal signature
    components. Two broadcast-ready joins (signatures are narrow)."""
    eq_terms = sum(
        F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    a = sig.alias("a")
    b = sig.alias("b")
    id_col = sig.columns[0]
    return (
        pairs.join(a, pairs.id_a == F.col(f"a.{id_col}"))
        .join(b, pairs.id_b == F.col(f"b.{id_col}"))
        .select(
            "id_a",
            "id_b",
            (eq_terms.cast("double") / F.lit(float(n_hashes))).alias("est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32, ngram: int = 1
) -> DataFrame:
    """SimHash per document over (distinct) token/shingle hashes.

    bit_j(doc) = 1 iff Σ_tokens (±1 by token-hash bit j) > 0. One shuffle:
    explode → groupBy(doc) with ``bits`` conditional sums, then assemble the
    integer JVM-side. ``bits`` ≤ 60 because the portable hash is 60-bit.
    """
    assert bits <= HASH_BITS
    ex = exploded_shingles(df, id_col, text_col, ngram)
    h = md5h60(F.col("shingle"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    per_doc = ex.groupBy(F.col(id_col)).agg(*aggs)
    sim = sum(
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        for j in range(bits)
    )
    return per_doc.select(F.col(id_col), sim.alias("simhash"))


def hamming64_expr(a: Column, b: Column) -> Column:
    """Popcount of XOR via bit_count — JVM built-in."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    sim: DataFrame, id_col: str, max_hamming: int = 3, bits: int = 64, blocks: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Scale path: two docs within Hamming r of each other agree exactly on at
    least one of r+1 disjoint bit blocks (the classic Charikar block
    trick) — so ``blocks`` must be ≥ max_hamming+1 and the pair join runs
    per (block, block-key) bucket, never across the corpus. Avoids the
    all-pairs cross join; a pathological bucket is AQE-skew-split.
    """
    assert blocks >= max_hamming + 1, "need r+1 disjoint blocks to guarantee recall"
    block_bits = bits // blocks
    mask = (1 << block_bits) - 1
    # one explode, not a blocks-arm union (same recompute rationale as
    # lsh_candidate_pairs: union arms re-run the simhash aggregate)
    entries = []
    for k in range(blocks):
        key = F.shiftright(F.col("simhash"), k * block_bits).bitwiseAND(F.lit(mask))
        entries.append(F.struct(F.lit(k).alias("blk"), key.alias("bkey")))
    banded = sim.select(
        F.col(id_col).alias("doc"),
        F.col("simhash").alias("sh"),
        F.explode(F.array(*entries)).alias("e"),
    ).select("doc", "sh", F.col("e.blk").alias("blk"), F.col("e.bkey").alias("bkey"))
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(r, ["blk", "bkey"])
        .filter(F.col("l.doc") < F.col("r.doc"))
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            hamming64_expr(F.col("l.sh"), F.col("r.sh")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 2,
    min_jaccard: float = 0.5,
    min_common: int = 2,
    df_cap: int | None = None,
    persist_shingles: bool = True,
) -> DataFrame:
    """Exact Jaccard over word-n-gram sets for every pair sharing ≥
    ``min_common`` shingles.

    Plan: explode → self-equi-join on shingle → pair-count agg → join the
    two per-doc set sizes → ratio. The shingle join is where skew lives at
    scale (hot shingles): a shingle in c docs contributes c·(c-1)/2 join
    rows, so stopword-grams ("of the") dominate the whole job while
    carrying zero dedup signal. ``df_cap`` drops shingles appearing in
    more than df_cap documents BEFORE the self-join, via a broadcast
    anti-join (the hot list is tiny by construction: at most
    total_instances/df_cap shingles). Set sizes are computed over the
    same capped shingle universe, so Jaccard stays internally consistent
    — it becomes "Jaccard over discriminative shingles", the form that
    survives 100 TB. Remaining skew below the cap: AQE skew-join.

    ``persist_shingles`` caches the exploded-shingle frame
    (MEMORY_AND_DISK): it is scanned three times (hot-list, per-doc
    sizes, both self-join sides share one reused exchange), and each
    rescan otherwise re-reads + re-tokenizes the full text corpus — 2.5×
    wall-time at sf0.1. At 100 TB the same reuse is served by
    materializing the shingle table once (DISK_ONLY or a checkpoint
    table) instead of executor memory.
    """
    ex = exploded_shingles(df, id_col, text_col, ngram)
    if persist_shingles:
        from pyspark import StorageLevel

        ex = ex.persist(StorageLevel.MEMORY_AND_DISK)
    if df_cap is not None:
        hot = (
            ex.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > df_cap)
            .select("shingle")
        )
        ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    l, r = ex.alias("l"), ex.alias("r")
    common = (
        l.join(r, "shingle")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


# ---------------------------------------------------------------------------
# near-dup clustering: connected components + keep-one-per-cluster
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 30,
    driver_cutoff: int = 1_000_000,
) -> DataFrame:
    """``(node, comp)`` for every node in ``pairs``; ``comp`` = min node id
    reachable in the undirected pair graph (the canonical cluster label).

    This is the ending the MinHash/SimHash families need: LSH emits PAIRS,
    but "keep one document per duplicate cluster" needs the transitive
    closure (a~b, b~c ⇒ one cluster {a,b,c}).

    Algorithm: min-label propagation with pointer-jumping —
    ``comp(v) ← min(comp(v), min_{u~v} comp(u), comp(comp(v)))``.
    Neighbor propagation alone converges in O(diameter) rounds; the
    pointer-jump join (each node adopts its current label's label) cuts
    long chains in O(log d) like hash-to-min [Rastogi et al. 2013,
    "Finding Connected Components in Map-Reduce"]. Near-dup clusters are
    shallow in practice, so most corpora converge in 2-3 rounds.

    Scale notes (the 10^10-node story):
    * each round = two hash-partitioned equi-joins + one groupBy, all on
      node ids — uniformly distributed keys, no skew by construction
      (a mega-cluster's rows still hash-spread across partitions; only
      its LABEL is shared).
    * ``localCheckpoint`` after every round truncates lineage — iterative
      DataFrame plans otherwise grow superlinearly under re-analysis
      (on a cluster with an HDFS checkpoint dir, ``checkpoint()`` gives
      the same cut plus fault tolerance).
    * convergence probe is an aggregate over the just-materialized round
      (cheap), not a full recompute.
    Reference parity: the reference has no dedup at all (SURVEY §2.4
    Distinct row) — this is new per the training-data-pipeline mandate.

    Small-graph fast path: thresholded near-dup pairs are the SMALL side
    by construction (true duplicates are rare), so below ``driver_cutoff``
    edges the components are solved with a driver-side min-union-find —
    one collect of the edge list (≤ ~16 MB at the default cutoff) instead
    of 2-3 distributed rounds of 2 joins each. Same output, bit-for-bit
    (min-root union ⇒ root = component min, identical to label
    propagation's fixpoint). This is the broadcast-join threshold idea
    applied to graph state; a 100 TB corpus whose pair graph exceeds the
    cutoff takes the distributed path automatically.
    """
    # symmetrize with ONE pass (explode of both orientations), not a
    # two-arm union that would re-run the expensive pair join per arm
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a_col).alias("u"), F.col(b_col).alias("v")),
                F.struct(F.col(b_col).alias("u"), F.col(a_col).alias("v")),
            )
        ).alias("e")
    ).select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
    edges = sym.distinct().persist()
    n_edges = edges.count()
    if n_edges <= driver_cutoff:
        rows = edges.collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r in rows:
            ru, rv = find(r["u"]), find(r["v"])
            if ru != rv:
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo  # min root wins → root IS the component min
        out = [(n, find(n)) for n in {r["u"] for r in rows}]
        edges.unpersist()
        spark = pairs.sparkSession
        schema = (
            pairs.select(
                F.col(a_col).alias("node"), F.col(a_col).alias("comp")
            ).schema
        )
        return spark.createDataFrame(out, schema)
    labels = (
        edges.select(F.col("u").alias("node")).distinct().withColumn("comp", F.col("node"))
    ).localCheckpoint()
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(edges.u.alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        jump = labels.select(F.col("comp").alias("_c"), F.col("node").alias("_n")).join(
            labels.select(F.col("node").alias("_c"), F.col("comp").alias("jump_comp")),
            "_c",
        ).select(F.col("_n").alias("node"), "jump_comp")
        new = (
            labels.join(nbr, "node", "left")
            .join(jump, "node", "left")
            .select(
                "node",
                F.least("comp", "nbr_comp", "jump_comp").alias("comp"),
                (F.least("comp", "nbr_comp", "jump_comp") < F.col("comp")).alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("_chg")).count()
        labels = new.drop("_chg")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def near_dup_components(
    df: DataFrame,
    id_col: str,
    dup_pairs: DataFrame,
) -> DataFrame:
    """Cluster assignment for EVERY document: ``(id, component, is_keeper)``.

    Docs in no pair are singleton components of themselves. ``is_keeper``
    marks the min-id doc per cluster — filtering on it yields the
    deduplicated corpus. Left join against the (small) component map; at
    scale the map is ≪ corpus (only docs with a near-dup), so Spark/AQE
    broadcasts it.
    """
    comp = connected_components(dup_pairs)
    return (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("component"),
            (F.coalesce("comp", F.col(id_col)) == F.col(id_col)).alias("is_keeper"),
        )
    )


# ---------------------------------------------------------------------------
# exact substring dedup (Lee et al. 2022) — duplicated k-gram spans
# ---------------------------------------------------------------------------

def substring_dup_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, min_count: int = 2
) -> DataFrame:
    """Exact substring dedup, the Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better") family at token granularity: find
    every k-token gram occurring ≥ ``min_count`` times corpus-wide, mark
    each occurrence's token interval [pos, pos+k), and merge overlapping
    or adjacent intervals per document into MAXIMAL duplicated spans —
    the ranges a training pipeline cuts. (The paper builds a suffix array;
    the sliding-k-gram equi-join computes the same ≥k-token duplicated
    regions as long as every duplicated region ≥ k tokens, which is the
    definition of the threshold.) All occurrences are marked, first
    included — the caller chooses a keep-first policy downstream.

    Output: ``(id, span_start, span_end, n_grams)`` — token offsets, end
    exclusive, one row per maximal span.

    Scale shape: grams stay JVM-side (``transform`` + ``slice`` over the
    token array, the shingles_expr pattern, hashed to md5h60 before the
    explode leaves the row); ONE shuffle keys grams by hash for the
    duplicate count (map-side partial agg collapses hot grams), and the
    mark-back is a LEFT SEMI equi-join on the same key — AQE broadcasts
    the dup-hash set while it is small (measured plan: BroadcastHashJoin
    LeftSemi, the gram side never re-shuffles), and past the broadcast
    threshold it degrades to a shuffled join on a key the grams exchange
    already uses; a 100-TB stopword gram costs its row count, never a
    pair blowup. The span merge is the islands pattern on one per-doc
    sort (two window frames sharing one exchange — pinned in the plan).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    gram_arr = F.when(
        F.size(toks) >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        spread(df)
        .select(F.col(id_col), F.posexplode(gram_arr).alias("pos", "gram"))
        .select(F.col(id_col), "pos", md5h60(F.col("gram")).alias("gram_h"))
    )
    dup = (
        grams.groupBy("gram_h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gram_h")
    )
    marked = grams.join(dup, "gram_h", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = marked.withColumn(
        "_new_isl",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("_isl", F.sum("_new_isl").over(w))
    return (
        flagged.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(F.col(id_col), "span_start", "span_end", "n_grams")
    )


def substring_dedup_apply(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, min_count: int = 2
) -> DataFrame:
    """The Lee et al. 2022 pipeline ENDING (r5): cut every non-first
    occurrence of a duplicated k-gram region and reassemble the documents.
    :func:`substring_dup_spans` only *marks* duplicated spans; this
    operator applies the keep-first policy — for each corpus-wide
    duplicated k-gram, the globally first occurrence (min (id, pos))
    survives, every later occurrence becomes a cut mark, cut marks merge
    into maximal intervals per doc (islands), and each document is rebuilt
    from the tokens outside its cut intervals.

    Output: ``(id, n_tokens, n_removed, clean_text)`` for EVERY input doc
    — ``clean_text`` is the whitespace-normalized lowercase token stream
    with the cuts applied (docs shorter than k tokens pass through).

    Scale shape: ONE gram-keyed exchange computes the duplicate count AND
    the keep-first winner together (``min(struct(id, pos))`` is map-side
    combinable — deliberately NOT a per-gram row_number window, which
    would sort a 100-TB stopword gram's occurrences in a single task);
    the mark-back is an equi-join on gram_h (AQE broadcasts the dup set
    under threshold, degrades to a shuffled equi-join above it — never
    nested-loop); the islands merge rides one per-doc exchange; and the
    reassembly joins the merged cut spans back per doc and filters tokens
    JVM-side (``F.filter`` with index + ``F.exists`` over the span array
    — no Python touches text, and span arrays are tiny relative to docs).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    gram_arr = F.when(
        F.size(toks) >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        spread(df)
        .select(F.col(id_col), F.posexplode(gram_arr).alias("pos", "gram"))
        .select(F.col(id_col), "pos", md5h60(F.col("gram")).alias("gram_h"))
    )
    dup_first = (
        grams.groupBy("gram_h")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct(id_col, "pos")).alias("_first"),
        )
        .filter(F.col("_c") >= min_count)
        .select("gram_h", "_first")
    )
    cuts = (
        grams.join(dup_first, "gram_h")
        .filter(
            ~(
                (F.col(id_col) == F.col(f"_first.{id_col}"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = cuts.withColumn(
        "_new_isl",
        (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("int"),
    ).withColumn("_isl", F.sum("_new_isl").over(w))
    spans = flagged.groupBy(id_col, "_isl").agg(
        F.min("pos").cast("long").alias("s"),
        (F.max("pos") + k).cast("long").alias("e"),
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("_cuts")
    )
    joined = (
        spread(df)
        .select(F.col(id_col), toks.alias("_toks"))
        .join(per_doc, id_col, "left")
        .withColumn(
            "_cuts", F.coalesce("_cuts", F.array().cast("array<struct<s:bigint,e:bigint>>"))
        )
    )
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.exists(F.col("_cuts"), lambda c: (i >= c["s"]) & (i < c["e"])),
    )
    return joined.select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


def host_mirrors(
    df: DataFrame,
    host_col: str,
    text_col: str,
    min_common: int = 2,
    min_ratio: float = 0.5,
    host_cap: int = 16,
) -> DataFrame:
    """Mirror-host detection (r5): hosts serving the same content under
    different names (mirrors, CDNs fronting one origin, scraped clones) —
    at crawl scale you want to fetch ONE of them and demote the rest
    before spending budget. Evidence = exact content fingerprints: two
    hosts sharing ≥ ``min_common`` distinct document fingerprints, with
    overlap ratio common/min(|A|,|B|) ≥ ``min_ratio``, are mirror
    candidates.

    Output: ``(host_a, host_b, n_common, overlap, is_mirror)`` for every
    pair with ≥ ``min_common`` shared fingerprints (host_a < host_b).

    Scale shape: pairs are generated ONLY through a fingerprint equi-join
    (the LSH-band discipline — never host×host). The blowup guard is
    ``host_cap``: a fingerprint present on more than that many distinct
    hosts is dropped before the self-join (k hosts → k² pairs; ubiquitous
    boilerplate is not mirror evidence anyway — the ngram_jaccard df_cap
    move). Host catalog sizes are counted over the SAME capped set so the
    ratio is internally consistent. Distinct-ing (host, fp) first bounds
    every downstream row count by the catalog, not the corpus.
    """
    fps = df.select(
        F.col(host_col).alias("host"), md5h60(F.col(text_col)).alias("fp")
    ).distinct()
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_nh"))
        .filter(F.col("_nh") > host_cap)
        .select("fp")
    )
    capped = fps.join(hot, "fp", "left_anti")
    sizes = capped.groupBy("host").agg(F.count(F.lit(1)).alias("_sz"))
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.host") < F.col("b.host")),
        )
        .groupBy(F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("_sz").alias("_sza"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("_sz").alias("_szb"))
    overlap = F.round(
        F.col("n_common") / F.least(F.col("_sza"), F.col("_szb")), 6
    )
    return (
        pairs.join(sa, "host_a")
        .join(sb, "host_b")
        .select(
            "host_a",
            "host_b",
            F.col("n_common").cast("long").alias("n_common"),
            overlap.alias("overlap"),
            (overlap >= min_ratio).alias("is_mirror"),
        )
    )


# ---------------------------------------------------------------------------
# content-defined chunking dedup (FastCDC/LBFS family at token granularity)
# ---------------------------------------------------------------------------

def cdc_chunk_dedup(
    df: DataFrame, id_col: str, text_col: str, modulus: int = 8
) -> DataFrame:
    """Content-defined chunking dedup (r5): the LBFS/FastCDC idea at token
    granularity. A chunk boundary opens before token p (1-based, p ≥ 2)
    whenever the hash of the bigram (tok[p-1], tok[p]) ≡ 0 mod
    ``modulus`` — boundaries are a function of CONTENT, not position, so
    inserting one token near the start of a document shifts every
    fixed-window span (:func:`span_dedup` finds nothing) but leaves every
    CDC boundary after the edit in place, and the unchanged chunks still
    dedup. Expected chunk length ≈ ``modulus`` tokens.

    Output: one row per chunk — ``(id, chunk_idx, n_chunk_tokens,
    chunk_hash, n_copies, is_keeper)``; keeper = the globally first
    occurrence (min (id, chunk_idx)) of each distinct chunk content.

    Scale shape: boundaries, chunk slicing, and chunk hashing all happen
    IN-ROW with JVM higher-order functions (filter/sequence/zip_with/
    slice over the token array — no per-doc window, no doc-keyed
    exchange, no Python); the only shuffle is the chunk-hash groupBy
    computing copies + keeper in one map-side-combinable agg (the
    substring_dedup_apply pattern), and the mark-back is an equi-join on
    chunk_hash (AQE broadcast under threshold). A corpus-hot chunk
    ("click here to subscribe") costs its row count, never a pair blowup.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    n = F.size(toks)
    # greatest(n,1) keeps sequence() ascending for empty docs; Spark's
    # sequence(2,1) would otherwise emit a DESCENDING [2,1] — the p>=2 &
    # p<=n guard drops those phantom positions
    bpos = F.filter(
        F.sequence(F.lit(2), F.greatest(n, F.lit(1))),
        lambda p: (p >= 2)
        & (p <= n)
        & (
            F.pmod(
                md5h60(F.concat_ws(" ", F.slice(toks, p - 1, 2))), F.lit(modulus)
            )
            == 0
        ),
    )
    starts = F.concat(F.array(F.lit(1)), bpos)
    ends = F.concat(bpos, F.array(n + 1))
    chunks = F.when(
        n >= 1,
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.struct(
                (e - s).alias("n_chunk_tokens"),
                md5h60(F.concat_ws(" ", F.slice(toks, s, e - s))).alias("chunk_hash"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<n_chunk_tokens:int,chunk_hash:bigint>>"))
    per_chunk = spread(df).select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c")
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        F.col("c.chunk_hash").alias("chunk_hash"),
    )
    agg = per_chunk.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.struct(id_col, "chunk_idx")).alias("_first"),
    )
    return per_chunk.join(agg, "chunk_hash").select(
        F.col(id_col),
        "chunk_idx",
        "n_chunk_tokens",
        "chunk_hash",
        "n_copies",
        (
            (F.col(id_col) == F.col(f"_first.{id_col}"))
            & (F.col("chunk_idx") == F.col("_first.chunk_idx"))
        ).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# span-level exact dedup + document reassembly (CCNet/RefinedWeb line dedup)
# ---------------------------------------------------------------------------

def span_dedup(
    df: DataFrame, id_col: str, text_col: str, span_tokens: int = 10
) -> DataFrame:
    """Corpus-wide exact dedup at sub-document granularity: split each doc
    into fixed ``span_tokens``-token windows, keep only the FIRST occurrence
    of each distinct span (global (doc_id, span_idx) order), and reassemble
    each document from its surviving spans in original order.

    This is the line/paragraph dedup of CCNet/RefinedWeb-style pipelines —
    the splitter here is a fixed token window because the corpus contract
    carries no newlines; swap ``spans`` for a split on '\\n' for real pages.

    Output: ``(id, n_spans, n_kept, clean_text)`` for EVERY input doc
    (fully-deduped docs keep an empty ``clean_text``).

    Scale shape: two shuffles — a window keyed on the span string (uniform
    by construction: distinct spans; hot spans are exactly what gets cut to
    one row) and the per-doc reassembly groupBy. Span strings travel the
    first shuffle once; at 100 TB hash the span (md5) for the window key
    and keep the text only on the surviving row.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    nspan = F.ceil(F.size(toks) / F.lit(float(span_tokens))).cast("int")
    idx = F.when(nspan >= 1, F.sequence(F.lit(0), nspan - 1)).otherwise(
        F.array().cast("array<int>")
    )
    spans = spread(df).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * span_tokens + 1, span_tokens)
                ),
            )
        ).alias("span_idx", "span"),
    )
    w = Window.partitionBy("span").orderBy(F.col(id_col), F.col("span_idx"))
    ranked = spans.withColumn("_rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("_rn") == 1, F.struct(F.col("span_idx"), F.col("span"))
    )
    agg = ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum((F.col("_rn") == 1).cast("long")).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["span"]
            ),
        ).alias("clean_text"),
    )
    return (
        df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )

def boilerplate_strip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    span_tokens: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Per-group template removal (the CCNet/RefinedWeb boilerplate pass):
    split each doc into fixed ``span_tokens``-token windows and drop every
    span that occurs in >= ``min_docs`` DISTINCT documents of the same
    ``group_col`` (site nav, headers, cookie banners — text a host repeats
    across its pages), then reassemble each doc from its surviving spans in
    original order.

    Differs from :func:`span_dedup` (global keep-FIRST): boilerplate is
    removed from EVERY copy including the first, and the repetition
    threshold is per-group, so phrases common across *different* sites
    survive.

    Output: ``(id, n_spans, n_boiler, clean_text)`` for EVERY input doc.

    Scale shape: the distinct-doc count per (group, span) is computed with
    two stacked window functions over ONE (group, span) exchange — a lag()
    marks each doc's first copy of a span in (id, span_idx) order, an
    unordered sum over the same partitioning counts those marks — instead
    of a groupBy(countDistinct) + self-join that would shuffle the span
    text twice. Reassembly is the per-doc groupBy. At 100 TB, key the
    window on md5(span) and keep text only on surviving rows (same note as
    :func:`span_dedup`); the (group, span) key is uniform by construction —
    a span hot across MANY groups still splits per group, and a span hot
    within one group is capped by that group's doc count.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    nspan = F.ceil(F.size(toks) / F.lit(float(span_tokens))).cast("int")
    idx = F.when(nspan >= 1, F.sequence(F.lit(0), nspan - 1)).otherwise(
        F.array().cast("array<int>")
    )
    spans = spread(df).select(
        F.col(id_col),
        F.col(group_col),
        F.posexplode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * span_tokens + 1, span_tokens)
                ),
            )
        ).alias("span_idx", "span"),
    )
    w_ord = Window.partitionBy(group_col, "span").orderBy(F.col(id_col), F.col("span_idx"))
    w_all = Window.partitionBy(group_col, "span")
    prev_id = F.lag(F.col(id_col)).over(w_ord)
    first_in_doc = prev_id.isNull() | (prev_id != F.col(id_col))
    # two Window operators, materialized separately (Spark rejects a window
    # expression nested inside another window's aggregate) — but both share
    # the (group, span) partitioning, so Catalyst plans ONE exchange
    marked = spans.withColumn("_fid", first_in_doc.cast("long")).withColumn(
        "_docs", F.sum("_fid").over(w_all)
    )
    keep_struct = F.when(
        F.col("_docs") < min_docs, F.struct(F.col("span_idx"), F.col("span"))
    )
    agg = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum((F.col("_docs") >= min_docs).cast("long")).alias("n_boiler"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(keep_struct)), lambda s: s["span"]
            ),
        ).alias("clean_text"),
    )
    return (
        df.select(F.col(id_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def detect_changes(
    old: DataFrame, new: DataFrame, key_col: str, fp_col: str
) -> DataFrame:
    """Snapshot diff for incremental recrawl (the batch analog of HTTP
    conditional GET): full-outer join two corpus snapshots on ``key_col``
    and classify every key as ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` by comparing content fingerprints. Downstream, only
    ``changed``+``added`` rows re-enter extraction and the dedup/index
    pipelines — at 100 TB this is the difference between reprocessing a
    crawl and reprocessing its delta.

    Scale shape: one equi-shuffle per side on the (uniformly distributed)
    key; with both snapshots stored bucketed on the key (Iceberg
    ``bucket(url, N)``) the join co-locates and only metadata moves.

    Output: ``(key, status, old_fp, new_fp)`` for every key in either
    snapshot.
    """
    o = old.select(F.col(key_col), F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(key_col), F.col(fp_col).alias("new_fp"))
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, key_col, "full_outer").select(
        F.col(key_col), status.alias("status"), "old_fp", "new_fp"
    )
