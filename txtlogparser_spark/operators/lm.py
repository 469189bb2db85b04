"""N-gram language-model perplexity scoring for corpus quality
filtering (the CCNet recipe: score documents with a small LM trained
on a reference corpus; drop/bucket by perplexity).

The 100-TB decomposition mirrors operators/bpe.py: training is ONE
corpus pass aggregating (context, word, count) with map-side combine —
integer sums, exact, skew-proof — into a model TABLE (the distinct
bigrams of the reference corpus, millions of rows, never |vocab|²
materialized). Scoring explodes each document's bigrams and joins the
model: two equi-joins (broadcast when the model is small, shuffle on
the bigram key otherwise) + per-doc aggregation. Log-probabilities are
computed at SCORING time from the integer counts (add-k smoothing), so
the model artifact itself is exact and engine-portable; floats appear
only in the final per-doc average, which is rounded before leaving the
operator (same trade as the existing quality/tfidf oracles).

Verification: DuckDB value parity + an independent Python model in
tests/test_lm_score.py (driver registry's 50-slot window is full).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

BOS = "<s>"


def _doc_words(text_col: str, lowercase: bool) -> Column:
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return F.filter(F.split(t, r"\s+", -1), lambda w: w != "")


def _bigrams(words: Column) -> Column:
    """[(prev, word)] over a word array, BOS context for the first
    word. Guarded for empty arrays: Spark's sequence(0, -1) would
    otherwise produce a DESCENDING [0, -1] and element_at would raise
    under ANSI."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(words)),
        lambda i: F.struct(
            F.when(i == 1, F.lit(BOS))
            .otherwise(F.element_at(words, i - 1))
            .alias("prev"),
            F.element_at(words, i).alias("word"),
        ),
    )
    return F.when(F.size(words) >= 1, pairs).otherwise(
        F.expr("cast(array() as array<struct<prev:string,word:string>>)")
    )


def _exploded_bigrams(
    docs: DataFrame, id_col, text_col: str, lowercase: bool
) -> DataFrame:
    """(id?, prev, word) — one row per document bigram; id omitted when
    id_col is None (training does not need it).

    The word array is materialized as a COLUMN first: `_bigrams`
    references it via element_at once per element, and a computed
    expression there would be re-evaluated per element (Catalyst does
    not CSE inside higher-order-function lambdas) — the full
    split+filter of the text per word, O(len²) per document. Measured:
    546 docs/s inline vs ~50k docs/s materialized at 200k docs."""
    ids = [F.col(id_col).alias("_id")] if id_col else []
    staged = docs.select(*ids, _doc_words(text_col, lowercase).alias("_ws"))
    cols = ([F.col("_id")] if id_col else []) + [
        F.explode(_bigrams(F.col("_ws"))).alias("_bg")
    ]
    return staged.select(*cols).select(
        *(["_id"] if id_col else []), "_bg.prev", "_bg.word"
    )


def bigram_lm_train(
    docs: DataFrame, *, text_col: str = "text", lowercase: bool = True
) -> tuple:
    """One corpus pass -> (bigram_counts, context_counts, vocab_size).

    bigram_counts: (prev, word, c) integer co-occurrence counts —
    PERSISTED (model-table-sized; caller unpersists when done);
    context_counts: (prev, n) total continuations of each context,
    derived from the model table (sum of c), not a corpus re-scan;
    vocab_size: |distinct words| + 1 (BOS) — the add-k denominator
    term. All integer aggregations with map-side partials; the corpus
    itself is scanned exactly once (materializing bigram_counts).
    """
    pairs = _exploded_bigrams(docs, None, text_col, lowercase)
    # ONE corpus pass: only bigram_counts touches the corpus (persisted,
    # materialized by the vocab count below); context totals and the
    # vocab size are derived from the model TABLE, not re-scans
    bigram_counts = (
        pairs.groupBy("prev", "word").agg(F.count(F.lit(1)).alias("c")).persist()
    )
    vocab_size = bigram_counts.select("word").distinct().count() + 1
    context_counts = bigram_counts.groupBy("prev").agg(
        F.sum("c").alias("n")
    )
    return bigram_counts, context_counts, vocab_size


def lm_score(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    k: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-document add-k bigram log-probability and perplexity:
    p(w|prev) = (c + k) / (n_prev + k*V); avg_log2p = mean log2 p;
    ppl = 2^(-avg_log2p). Unseen bigrams/contexts degrade through the
    left joins to the smoothed floor (c=0, n_prev=0 -> 1/V).

    Output: (id_col, n_bigrams, avg_log2p, ppl) — a document of pure
    reference-corpus text scores low ppl; out-of-domain or junk text
    scores high. Empty documents (no words) produce no bigrams and are
    absent from the output, like the other per-doc scorers.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if k <= 0:
        raise ValueError(f"add-k smoothing needs k > 0, got {k}")
    exploded = _exploded_bigrams(docs, id_col, text_col, lowercase)
    joined = (
        exploded.join(bigram_counts, ["prev", "word"], "left")
        .join(context_counts, ["prev"], "left")
        .select(
            "_id",
            F.log2(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(k)))
                / (
                    F.coalesce(F.col("n"), F.lit(0))
                    + F.lit(float(k) * vocab_size)
                )
            ).alias("_lp"),
        )
    )
    out = joined.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_lp"), round_to).alias("avg_log2p"),
    )
    return out.select(
        F.col("_id").alias(id_col),
        "n_bigrams",
        "avg_log2p",
        F.round(F.pow(F.lit(2.0), -F.col("avg_log2p")), round_to).alias("ppl"),
    )
