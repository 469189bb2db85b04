"""Token-id frequency / coverage statistics over pre-tokenized corpora.

The north-star input is tokens:array<int>; the first report any
tokenizer-health or mixture audit asks for is per-group (source,
language, shard) id-frequency structure: how many token occurrences,
how many DISTINCT ids, and what fraction of the total token mass the
top-k most frequent ids carry (the "coverage curve" — a tokenizer whose
top-100 ids carry 90% of a source's mass is compressing badly or the
source is degenerate boilerplate).

Scale shape (the quota_sample / quantile_buckets lesson):
  - `token_frequency` is ONE explode + map-side-combined groupBy on
    (group, token) — the result is a DIM bounded by |vocab| × |groups|
    rows, never corpus-sized; skew-proof (a 10^9-copy token partially
    aggregates per map partition).
  - `token_coverage` runs its rank window over THAT DIM only — the
    fact table is never group-sorted and no single task ever receives
    a whole group of raw rows.
  - All counts are exact integers; the two fractions round(6) at the
    very end, so every value replays bit-identically in DuckDB.

Determinism: ties on count rank by (count DESC, token ASC) — a total
order, so top-k sets are engine- and partitioning-invariant.

Reference parity: TxtLogParser has no token-statistics concept;
training-pipeline extension (SURVEY.md §2 beyond-reference ops).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def token_frequency(
    df: DataFrame,
    tokens_col: str = "tokens",
    group_col: str | None = None,
) -> DataFrame:
    """(group?, token, n) exact occurrence counts — the dim every
    downstream coverage/top-k report runs over. group_col=None counts
    corpus-wide."""
    cols = ([F.col(group_col)] if group_col else []) + [
        F.explode(F.col(tokens_col)).alias("token")
    ]
    keys = ([group_col] if group_col else []) + ["token"]
    return (
        df.select(*cols)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def token_coverage(
    df: DataFrame,
    tokens_col: str = "tokens",
    group_col: str = "source",
    k: int = 100,
) -> DataFrame:
    """Per-group tokenizer-coverage report:

      n_tokens    — total token occurrences in the group
      n_distinct  — distinct token ids
      topk_mass   — occurrences carried by the k most frequent ids
                    (ties broken token-ascending; groups with fewer
                    than k distinct ids cover everything)
      coverage    — round(topk_mass / n_tokens, 6)
      top_token   — the single most frequent id (deterministic witness)

    The window ranks the (group, token, n) dim — |vocab|-bounded — not
    the corpus; one broadcast-sized aggregate result per group."""
    if k < 1:
        raise ValueError("k must be >= 1")
    freq = token_frequency(df, tokens_col, group_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    ranked = freq.withColumn("_rk", F.row_number().over(w))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("_rk") <= k, F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("topk_mass"),
            F.min(F.when(F.col("_rk") == 1, F.col("token"))).alias("top_token"),
        )
        .withColumn(
            "coverage",
            F.round(F.col("topk_mass") / F.col("n_tokens"), 6),
        )
    )
