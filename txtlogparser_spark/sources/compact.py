"""Sink-side compaction: the small-files problem at 100 TB.

A routed/filtered/deduped stage often ends with thousands of tasks each
holding a sliver of output; writing task-per-file yields millions of
KB-sized parquet files that destroy downstream scan performance (open
cost dominates) and metastore health. The idiomatic Spark fix is NOT a
driver-side count + repartition(n) (an extra full pass and a magic
number) but AQE's REBALANCE hint: at runtime the exchange coalesces
small partitions AND splits skewed ones to the advisory partition size,
so file sizes track `spark.sql.adaptive.advisoryPartitionSizeInBytes`
with zero extra passes.

`write_compacted` wraps that: REBALANCE (optionally keyed so rows of
one partition value co-locate), sortWithinPartitions for locality/
row-group pruning (min-max stats become selective), then a partitioned
parquet write.

Reference parity: TxtLogParser appends rendered pages to one in-memory
window (OutputWindow.h) — file-layout management is a pure at-scale
extension (SURVEY.md sect.2 sinks S4/S5 are the semantic counterparts).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


def rebalanced(df: DataFrame, *keys: str) -> DataFrame:
    """AQE-rebalanced frame: runtime-coalesced/split to the advisory
    partition size. With keys, rows sharing a key land together (what a
    later partition-pruned read wants); without, pure size balancing."""
    return df.hint("rebalance", *keys) if keys else df.hint("rebalance")


def write_compacted(
    df: DataFrame,
    path: str,
    partition_by: Optional[Sequence[str]] = None,
    sort_within: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Compacted, locality-sorted parquet write.

    - rebalance keyed by the partition columns → each hive partition is
      written by few, right-sized tasks (no small-file spray, no
      one-task hot partition: AQE splits oversized keys).
    - sortWithinPartitions → parquet row-group min/max stats become
      selective for the sort columns; downstream range predicates skip
      row groups instead of scanning them.
    """
    out = rebalanced(df, *(partition_by or []))
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
