"""Text analysis: tokenization, quality scoring, language-ID, fingerprints.

All operators here are pure built-in Column expressions — they run entirely
inside whole-stage codegen (no Python, no Arrow transfer), so a 100 TB scan
is bounded by parquet read throughput, not UDF overhead. Every expression
has an exact ANSI-SQL twin (used by ``__spark_entry__.oracle_sql``), which
is why the formulas avoid engine-specific hash functions in favour of md5.

The reference crawler has no text-analysis layer (it stops at rule
extraction, /root/reference/collector.go:92-99); these are the north-rule
additions that make the engine a usable corpus-curation pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language stopword seed lists (order matters only for docs).
# A production run swaps in full lists; the *mechanism* (vectorized
# membership count + argmax) is what scales.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "y", "es", "una", "para", "con", "por"),
}


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens of lowercased text, empties dropped.

    ``filter`` guards the empty-string artifacts that ``split`` produces on
    leading/trailing whitespace so token counts agree with any sane
    tokenizer (and with the SQL oracle's ``regexp_split_to_array``).
    """
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def token_count_expr(text: Column) -> Column:
    """Whitespace token count (see :func:`subword_count_expr` for the
    BPE-ish variant — same shape, same cost)."""
    return F.size(tokens_expr(text))


# GPT-2-style pre-tokenizer shape: contraction suffixes, letter runs, digit
# runs, punctuation runs (optionally space-prefixed). Constructs restricted
# to what Java regex and RE2 (DuckDB) evaluate identically.
SUBWORD_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def subword_count_expr(text: Column) -> Column:
    """BPE-ish subword token count: how many pre-tokenizer pieces the text
    splits into — the standard proxy for LLM token cost of a document.
    Pure ``regexp_extract_all`` → whole-stage codegen, no Python."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit("(" + SUBWORD_PATTERN + ")"), 1)
    )


def stopword_count_expr(text: Column, lang: str) -> Column:
    """How many tokens (with multiplicity) are stopwords of ``lang``."""
    vocab = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens_expr(text), lambda t: F.array_contains(vocab, t)))


def lang_id_expr(text: Column) -> Column:
    """Stopword-vote language ID: argmax over per-language stopword hits,
    ties broken by language-code order, 'und' (undetermined) when no
    stopword of any language occurs.

    Scale: a constant-width set of counters per row — embarrassingly
    parallel, no shuffle. Real n-gram models drop in by replacing the
    counter expressions; the argmax scaffold is unchanged.
    """
    scores = [(lang, stopword_count_expr(text, lang)) for lang in sorted(STOPWORDS)]
    # argmax with first-wins tie-break: only strictly-greater replaces
    best_lang: Column = F.lit(scores[0][0])
    best_score = scores[0][1]
    for lang, score in scores[1:]:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features, all JVM-side:

    * ``n_chars``        — length
    * ``n_tokens``       — whitespace tokens
    * ``avg_token_len``  — (chars excluding whitespace) / tokens
    * ``stopword_ratio`` — EN stopword tokens / tokens
    * ``uniq_ratio``     — distinct tokens / tokens (repetition detector)
    * ``quality_score``  — a fixed linear blend, rounded to 4 d.p. so the
      value is reproducible across engines and float orders
    """
    toks = tokens_expr(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    non_ws = F.length(F.regexp_replace(text, r"\s+", ""))
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    avg_token_len = F.round(non_ws / safe_tokens, 4)
    stop_ratio = F.round(stopword_count_expr(text, "en") / safe_tokens, 4)
    uniq_ratio = F.round(F.size(F.array_distinct(toks)) / safe_tokens, 4)
    score = F.round(
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.2
        + uniq_ratio * 0.4,
        4,
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": avg_token_len,
        "stopword_ratio": stop_ratio,
        "uniq_ratio": uniq_ratio,
        "quality_score": score,
    }


def fingerprint_expr(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. Used as the exact-dedup key; md5 (not xxhash64) so the
    DuckDB oracle computes the identical digest. At 100 TB the fingerprint
    is computed in the scan stage and becomes the shuffle key for dedup —
    uniformly distributed by construction, so no skew handling needed.
    """
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)
