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


def token_eval_gram_set(
    eval_df: DataFrame, tokens_col: str = "tokens", n: int = 8
) -> DataFrame:
    """Distinct token n-gram digests of the eval set — the broadcast
    probe side of the TOKEN-NATIVE decontamination path. One column
    `gram` (md5 of the comma-joined id slice, same digest scheme as
    token_ngram_dedup so index tables are shareable)."""
    from txtlogparser_spark.operators.dedup import token_ngrams

    return (
        eval_df.select(
            F.explode(token_ngrams(F.col(tokens_col), n)).alias("gram")
        ).distinct()
    )


def token_contamination_flags(
    train_df: DataFrame,
    eval_df: DataFrame,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
) -> DataFrame:
    """Token-array-native contamination_flags: the same eval-gram
    broadcast probe, over tokens:array<int> instead of text.

    The north-star input is PRE-TOKENIZED sequences — at that point the
    text is gone, and decontamination must key on token-id n-grams (the
    form GPT-3/PaLM-style 13-gram decontamination actually runs in:
    benchmark text is tokenized with the training tokenizer, then
    id-gram overlap is exact). Same contract as contamination_flags:

      is_contaminated — true iff any shared token n-gram exists
      n_hit_grams     — number of DISTINCT shared grams (0 when clean)
      first_hit       — lexicographically smallest shared gram digest
                        (deterministic witness; NULL when clean)

    Scale shape (identical to the text path): eval grams are the
    benchmark-sized broadcast side; the train side pays one map-side
    explode+probe (token_ngrams is pure Catalyst — no Python) plus the
    single per-doc groupBy. Never a shuffle of train grams against the
    eval side, never quadratic."""
    from txtlogparser_spark.operators.dedup import token_ngrams

    grams = token_eval_gram_set(eval_df, tokens_col, n)
    train_grams = train_df.select(
        key,
        F.explode(
            F.array_distinct(token_ngrams(F.col(tokens_col), n))
        ).alias("gram"),
    )
    hits = (
        train_grams.join(F.broadcast(grams), "gram")
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_hit_grams"),
            F.min("gram").alias("first_hit"),
        )
    )
    return (
        train_df.select(key)
        .join(hits, key, "left")
        .select(
            key,
            F.col("n_hit_grams").isNotNull().alias("is_contaminated"),
            F.coalesce(F.col("n_hit_grams"), F.lit(0))
            .cast("long")
            .alias("n_hit_grams"),
            "first_hit",
        )
    )


def decontaminate_tokens(
    train_df: DataFrame,
    eval_df: DataFrame,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
) -> DataFrame:
    """Training set with token-gram-contaminated sequences REMOVED —
    the pipeline stage over pre-tokenized input (token_contamination_
    flags is the audit report). Broadcast probe + left-anti, keeps
    every non-key column."""
    grams = token_eval_gram_set(eval_df, tokens_col, n)
    from txtlogparser_spark.operators.dedup import token_ngrams

    dirty = (
        train_df.select(
            key, F.explode(token_ngrams(F.col(tokens_col), n)).alias("gram")
        )
        .join(F.broadcast(grams), "gram")
        .select(key)
        .distinct()
    )
    return train_df.join(dirty, key, "left_anti")


# ---------------------------------------------------------------------------
# Fuzzy (near-duplicate) decontamination.
#
# Exact n-gram overlap (above) misses eval text that was paraphrased,
# truncated, or lightly reworded into the training corpus; the standard
# second line of defense (Gopher/MassiveText, most open pipelines) is
# MinHash-Jaccard NEAR-duplicate matching between train docs and the
# eval set. Built entirely from the already-verified dedup primitives
# (shingle → minhash → band → candidate-restricted Jaccard), pointed
# across two tables instead of within one.
#
# Scale shape (100 TB train side, benchmark-sized eval side): the eval
# set's LSH band table is tiny (|eval| × nbands rows) and is BROADCAST
# into the candidate join, so the train side pays one signing pass
# (map-side explode + per-doc groupBy — the minimum any minhash scheme
# costs) and ZERO shuffle against the eval side; only the candidate
# pairs (≈ true near-dups + band collisions) reach the exact Jaccard
# verify, which is O(candidates) by the same candidate-restricted plan
# as the batch dedup chain. Never all-pairs, never an eval-side shuffle.
# ---------------------------------------------------------------------------


def fuzzy_contamination_pairs(
    train_df: DataFrame,
    eval_df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Verified near-duplicate (train_id, eval_id, jacc) pairs with
    shingle-Jaccard ≥ threshold. Keys are tag-prefixed internally
    ('t:'/'e:') so the two tables may share id values; outputs carry the
    ORIGINAL key values (as strings — cast back if needed)."""
    from txtlogparser_spark.operators.dedup import (
        band_table,
        minhash_signatures,
        ngram_jaccard_pairs,
        probe_lsh_index,
        shingle_table,
    )

    t = train_df.select(
        F.concat(F.lit("t:"), F.col(key).cast("string")).alias("_k"),
        F.col(text_col).alias("_txt"),
    )
    e = eval_df.select(
        F.concat(F.lit("e:"), F.col(key).cast("string")).alias("_k"),
        F.col(text_col).alias("_txt"),
    )
    idx = band_table(
        minhash_signatures(shingle_table(e, "_k", "_txt", n), "_k", num_hashes),
        "_k",
        num_hashes,
        band_size,
    )
    cands = probe_lsh_index(
        F.broadcast(idx), t, "_k", "_txt", num_hashes, band_size
    ).select(F.col("new_id").alias("doc_a"), F.col("index_id").alias("doc_b"))
    verified = ngram_jaccard_pairs(
        t.unionByName(e), "_k", "_txt", n, threshold, candidates=cands
    )
    return verified.select(
        F.substring("doc_a", 3, 2**30).alias("train_id"),
        F.substring("doc_b", 3, 2**30).alias("eval_id"),
        "jacc",
    )


def fuzzy_contamination_flags(
    train_df: DataFrame,
    eval_df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-train-doc audit: is_fuzzy_contaminated, the best Jaccard to
    any eval doc (NULL when clean), and the smallest matching eval id
    (deterministic witness). Same columns-of-record contract as
    contamination_flags."""
    pairs = fuzzy_contamination_pairs(
        train_df, eval_df, key, text_col, n, num_hashes, band_size, threshold
    )
    kt = train_df.schema[key].dataType
    hits = (
        pairs.groupBy(F.col("train_id").cast(kt).alias(key))
        .agg(
            F.max("jacc").alias("best_jacc"),
            F.min(F.col("eval_id").cast(kt)).alias("matched_eval_id"),
        )
    )
    return (
        train_df.select(key)
        .join(hits, key, "left")
        .select(
            key,
            F.col("best_jacc").isNotNull().alias("is_fuzzy_contaminated"),
            "best_jacc",
            "matched_eval_id",
        )
    )


def decontaminate_fuzzy(
    train_df: DataFrame,
    eval_df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Training set with fuzzy-contaminated docs REMOVED — the pipeline
    stage (fuzzy_contamination_flags is the audit report). The dirty-id
    set is ≤ |verified pairs| rows → broadcast left-anti."""
    pairs = fuzzy_contamination_pairs(
        train_df, eval_df, key, text_col, n, num_hashes, band_size, threshold
    )
    kt = train_df.schema[key].dataType
    dirty = pairs.select(F.col("train_id").cast(kt).alias(key)).distinct()
    return train_df.join(F.broadcast(dirty), key, "left_anti")


def contamination_matrix(
    train_df: DataFrame,
    eval_df: DataFrame,
    *,
    key: str = "doc_id",
    text_col: str = "text",
    train_group: str = "source",
    eval_group: str = "task",
    n: int = 8,
) -> DataFrame:
    """Per-(training source × eval task) contamination matrix — the
    report a release audit actually publishes ("which corpus slices
    leak which benchmarks"), aggregating contamination_flags' per-doc
    verdicts up to the slice level:

      n_hit_docs   — distinct training docs of the source sharing ≥1
                     word n-gram with the task
      n_hit_grams  — distinct (training doc, shared gram) pairs (the
                     leak volume; each doc's shingles are distinct and
                     the eval side is deduped per task, so the join's
                     count(*) is exactly this)

    Scale shape: identical to contamination_flags — the eval side's
    distinct (task, shingle) set broadcasts, the training side pays
    one map-side explode+probe, and the aggregate is grouped on
    (source, task): a dim bounded by |sources|·|tasks|. The
    count_distinct over doc ids expands to (source, task, doc) partial
    rows — bounded by the HIT volume, not the corpus (clean docs never
    leave the probe)."""
    grams = (
        eval_df.select(
            F.col(eval_group).alias("_task"),
            F.explode(word_shingles(text_col, n)).alias("shingle"),
        )
        .distinct()
    )
    hits = train_df.select(
        F.col(train_group).alias("_grp"),
        F.col(key).alias("_k"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    ).join(F.broadcast(grams), "shingle")
    return (
        hits.groupBy("_grp", "_task")
        .agg(
            F.countDistinct("_k").cast("long").alias("n_hit_docs"),
            F.count(F.lit(1)).cast("long").alias("n_hit_grams"),
        )
        .select(
            F.col("_grp").alias(train_group),
            F.col("_task").alias(eval_group),
            "n_hit_docs",
            "n_hit_grams",
        )
    )


def contamination_gate_column(
    eval_grams: list,
    *,
    text_col: str = "text",
    n: int = 8,
) -> "Column":
    """Map-only contamination hit count against a COLLECTED eval gram
    list — the streaming/arriving-shard formulation: the eval set's
    distinct grams (benchmark-sized, the side contamination_flags
    already broadcasts) are collected once and compared per doc with
    array_intersect, so the same expression gates a batch corpus or a
    Structured Streaming source with zero shuffle and zero state.
    Equals contamination_flags' n_hit_shingles (both sides distinct;
    pinned in tests/test_streaming_curation.py). Use the join-based
    contamination_flags when the eval gram set is too big to collect —
    the cutover is the same broadcast-size judgment Spark itself makes.
    """
    from pyspark.sql import Column  # noqa: F401

    arr = F.array(*[F.lit(g) for g in sorted(set(eval_grams))])
    return F.size(F.array_intersect(word_shingles(text_col, n), arr))
