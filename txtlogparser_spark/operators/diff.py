"""Corpus snapshot diff — the dataset-versioning audit.

Between two versions of a corpus (two Iceberg snapshots / crawl dumps /
curation runs), classify every document as added / removed / changed /
unchanged by key + content digest. This is the operator behind
"what changed since the snapshot we trained on" — the input to
incremental dedup (probe_lsh_index signs only the arriving shard),
incremental decontamination, and training-data changelogs.

Scale shape: ONE full-outer sort-merge join on the document key — the
canonical snapshot-diff plan. Both sides project to (key, digest)
before the exchange, so the shuffle carries two thin columns per side
regardless of document width; at 100 TB, storing both snapshots
bucketed by the key (sources/compact.py bucketing) makes the join
shuffle-free. The digest is computed map-side (md5 of the content
column) when not already materialized.

Reference parity: the Spark analog of the reference's reload path
(S3, OutputData.cpp:98-110) generalized to content versioning;
beyond-reference training-pipeline extension (SURVEY.md §2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["corpus_diff", "corpus_diff_summary"]

_STATUSES = ("added", "removed", "changed", "unchanged")


def _keyed_digest(df: DataFrame, key: str, digest_col, text_col: str, name: str):
    d = F.col(digest_col) if digest_col else F.md5(F.col(text_col))
    return df.select(F.col(key), d.alias(name))


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    digest_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-document version status between two corpus snapshots:
    (key, status) with status in added | removed | changed | unchanged.

      added     — key only in `new`
      removed   — key only in `old`
      changed   — key in both, digests differ
      unchanged — key in both, digests equal

    `digest_col` names a precomputed content digest; otherwise
    md5(text_col) is computed map-side on both sides. Keys must be
    unique per snapshot (the usual corpus invariant); duplicate keys
    would cross-multiply in the join. A NULL digest on exactly one
    side of a matched key counts as changed (null-safe comparison)."""
    o = _keyed_digest(old, key, digest_col, text_col, "_d_old").withColumn(
        "_in_old", F.lit(1)
    )
    n = _keyed_digest(new, key, digest_col, text_col, "_d_new").withColumn(
        "_in_new", F.lit(1)
    )
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("_d_old").eqNullSafe(F.col("_d_new")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(key, status.alias("status"))


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    digest_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-status (status, n_docs) rollup of corpus_diff — every status
    always present (zero-filled via an inline statuses dim, so the
    changelog schema is stable even for identical snapshots)."""
    counts = (
        corpus_diff(old, new, key, digest_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    statuses = old.sparkSession.createDataFrame(
        [(s,) for s in _STATUSES], "status STRING"
    )
    return (
        statuses.join(counts, "status", "left_outer")
        .select(
            "status",
            F.coalesce(F.col("n_docs"), F.lit(0).cast("long")).alias(
                "n_docs"
            ),
        )
    )
