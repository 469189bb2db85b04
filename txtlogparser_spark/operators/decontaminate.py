"""Train/eval decontamination for training-data pipelines.

A pretraining corpus must not contain evaluation-set text: any training
document sharing a word n-gram with a held-out benchmark leaks the
benchmark into the model (the standard n-gram-overlap decontamination
used by public LLM data pipelines; GPT-3 used 13-grams, Gopher/MassiveText
used 13-gram Jaccard, most open pipelines use 8-13 word n-grams).

Scale shape (100 TB training side, small eval side):
- The eval set is benchmark-sized (thousands to low millions of rows) —
  its distinct n-gram set is the SMALL side and is broadcast, so the
  training side is a single map-side pass: explode n-grams, hash-probe
  the broadcast set, aggregate per doc. One shuffle (the per-doc
  groupBy), no shuffle of the eval side, never an all-pairs join.
- N-grams reuse `word_shingles` (pure Catalyst split/sequence/transform,
  no UDF), so the explode stays in whole-stage codegen.
- If the eval side ever outgrows broadcast (unusual), the same plan
  degrades gracefully to a shuffled semi-join on the shingle key —
  still O(|train grams| + |eval grams|), never quadratic.

Reference parity: TxtLogParser has no decontamination concept; this is
one of the training-pipeline extensions the Spark engine adds on top of
the reference's filter semantics (SURVEY.md sect.2 "beyond-reference" ops).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from txtlogparser_spark.operators.dedup import word_shingles


def eval_ngram_set(eval_df: DataFrame, text_col: str = "text", n: int = 8) -> DataFrame:
    """Distinct word n-grams of the eval/benchmark set — the broadcast
    probe side. One column `shingle`."""
    return (
        eval_df.select(F.explode(word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def contamination_flags(
    train_df: DataFrame,
    eval_df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Flag every training doc that shares >=1 word n-gram with the eval
    set.

    Returns train rows (key column) plus:
      is_contaminated  — true iff any shared n-gram exists
      n_hit_shingles   — number of DISTINCT shared n-grams (0 when clean)
      first_hit        — lexicographically smallest shared n-gram
                         (deterministic witness; NULL when clean)

    `word_shingles` emits distinct shingles per doc, and the eval set is
    deduped, so `count(*)` over the join is exactly the distinct-shared
    count — deterministic and oracle-checkable.
    """
    grams = eval_ngram_set(eval_df, text_col, n)
    train_grams = train_df.select(
        key, F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    hits = (
        train_grams.join(F.broadcast(grams), "shingle")
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_hit_shingles"),
            F.min("shingle").alias("first_hit"),
        )
    )
    return (
        train_df.select(key)
        .join(hits, key, "left")
        .select(
            key,
            F.col("n_hit_shingles").isNotNull().alias("is_contaminated"),
            F.coalesce(F.col("n_hit_shingles"), F.lit(0)).cast("long").alias(
                "n_hit_shingles"
            ),
            "first_hit",
        )
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Return the training set with contaminated docs REMOVED — the
    actual pipeline stage (contamination_flags is the audit report).
    Same broadcast anti-join shape: one map-side probe + left-anti."""
    grams = eval_ngram_set(eval_df, text_col, n)
    dirty = (
        train_df.select(key, F.explode(word_shingles(text_col, n)).alias("shingle"))
        .join(F.broadcast(grams), "shingle")
        .select(key)
        .distinct()
    )
    return train_df.join(dirty, key, "left_anti")
