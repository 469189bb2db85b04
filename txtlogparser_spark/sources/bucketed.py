"""Storage-level bucketing: shuffle-free co-located joins.

The dedup / similarity / packing chains join the corpus on `doc_id`
over and over (candidate verify, components, keep-list application,
manifest assembly). Each join hash-shuffles the fact table — at 10^12
rows that is the dominant cost, and it is paid per join. Spark's
storage bucketing amortizes it to ONCE: persist the table with
`bucketBy(N, key)` (+ `sortBy` for merge-ready runs) and every
subsequent equi-join or aggregation on that key reads the bucket
layout instead of exchanging:

  * both sides bucketed with the SAME bucket count on the join key →
    SortMergeJoin with NO Exchange on either side (the test pins this
    plan shape);
  * one side bucketed → only the other side shuffles (pinned too);
  * groupBy(key) on a bucketed table → no pre-aggregation exchange.

This is the static-storage counterpart of the runtime techniques the
pipeline already uses (broadcast dims, salted repartition for hot
sources, AQE skew splitting): those defuse a single bad shuffle,
bucketing removes repeated ones. The Iceberg analog is a `bucket(N,
key)` partition transform; this module uses Spark's native parquet
bucketing because the sandbox has no Iceberg runtime
(sources/iceberg.py documents that gap).

Operational notes (the sharp edges, so callers don't rediscover them):
  * bucketBy REQUIRES saveAsTable (a catalog entry carries the bucket
    spec; .parquet(path) silently drops it). Pass `path` to keep the
    data external so dropping the table never deletes data.
  * Bucket counts must match between the two sides (or be multiples
    with spark.sql.bucketing.coalesceBucketsInJoin.enabled) — mixed
    counts fall back to a full shuffle.
  * One output file per (task, bucket): repartition(key) BEFORE the
    write, or small inputs fan out into tasks×buckets tiny files.
  * Reads are V1 parquet scans: filter pushdown and column pruning
    behave exactly like the unbucketed path.

Reference parity: no storage concept in TxtLogParser (files re-read per
refresh, OutputData.cpp:98-110); 100-TB extension per the brief's
"partitioning & shuffle" mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` bucketed (and optionally sorted) by `key` as catalog
    table `table`. One shuffle now (repartition into the bucket layout),
    zero shuffles for every later equi-join/aggregate on `key`."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    w = (
        df.repartition(int(n_buckets), key)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(int(n_buckets), key)
    )
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Equi-join two bucketed catalog tables on their bucket key. With
    matching bucket counts the plan is a SortMergeJoin with no Exchange
    on either side (pinned in tests/test_bucketed.py)."""
    return spark.table(left).join(spark.table(right), key, how)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange nodes in the executed (non-AQE) physical plan
    — the test/assert surface for 'this join did not shuffle'."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for ln in plan.splitlines() if "Exchange" in ln)
