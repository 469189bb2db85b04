"""W1: display window over the global total order (source_rank, line_no).

OutputWindow semantics (OutputWindow.cpp:22-45): a [top, bottom] inclusive
slice of the ordered surviving set, visibleLineCount=100000
(OutputWindow.h:27), with end-clamping.

Spark shape — NO single-partition window anywhere: the global row index
over the total order (part, order) decomposes as

    global_idx = offset(part) + row_number() within part

where `offset(part)` is the cumulative row count of all partitions that
sort strictly before `part`. The within-partition row_number is a
partitioned window (parallel across sources); the offsets live on a tiny
one-row-per-source dim whose prefix sums come from a broadcast self-join
(count/sum of strictly-smaller partitions) — so no plan node funnels the
fact table, or even the dim, through one task. At 100 TB the page is a
per-source-parallel window + a per-row filter, never a full-table funnel.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from txtlogparser_spark.oracle.pipeline import VISIBLE_LINE_COUNT, window_slice

ORDER_KEYS = ["source_rank", "line_no"]


def ordered_partition_dim(df: DataFrame, part_col: str) -> DataFrame:
    """Tiny dim (one row per `part_col` value) carrying the partition's
    position in the global total order:

      _n    — rows in this partition
      _rank — # partitions sorting strictly before it (== dense_rank - 1)
      _off  — total rows in partitions sorting strictly before it

    Built with groupBy + broadcast self-join only: the groupBy on the fact
    table is a map-side-combined K-row aggregate (K = #sources), and the
    prefix sums never leave hash-partitioned execution — no
    `Exchange SinglePartition` anywhere in the plan.
    """
    cnt = df.groupBy(part_col).agg(F.count(F.lit(1)).alias("_n"))
    a, b = cnt.alias("_ca"), cnt.alias("_cb")
    return (
        a.join(
            F.broadcast(b),
            F.col(f"_cb.{part_col}") < F.col(f"_ca.{part_col}"),
            "left",
        )
        .groupBy(F.col(f"_ca.{part_col}").alias(part_col), F.col(f"_ca._n").alias("_n"))
        .agg(
            F.count(F.col(f"_cb.{part_col}")).cast("int").alias("_rank"),
            F.coalesce(F.sum(F.col("_cb._n")), F.lit(0)).cast("long").alias("_off"),
        )
    )


def with_global_index(
    df: DataFrame,
    part_col: str,
    order_cols: Sequence[str],
    out: str = "_rn",
) -> DataFrame:
    """0-based dense global index over the total order (part_col,
    *order_cols) without a single-partition window: partitioned
    row_number + broadcast cumulative offsets (see module docstring)."""
    wp = Window.partitionBy(part_col).orderBy(*order_cols)
    local = df.withColumn("_local_idx", F.row_number().over(wp) - 1)
    off = ordered_partition_dim(df, part_col).select(part_col, "_off")
    return (
        local.join(F.broadcast(off), part_col)
        .withColumn(out, (F.col("_off") + F.col("_local_idx")).cast("long"))
        .drop("_local_idx", "_off")
    )


def page(
    df: DataFrame,
    total: int,
    *,
    visible: int = VISIBLE_LINE_COUNT,
    top: int = -1,
    with_prefix: bool = False,
) -> DataFrame:
    """Return the visible window slice, ordered, with optional display
    prefix '%1 [%2:%3]' (outputdisplaywidget.cpp:448-454).

    `total` is the surviving-line count and drives the clamp; the
    prefix zero-pad width follows the RENDERED window's line count —
    the reference pads to QString::number(outputLines.size()).length()
    where outputLines is the fetched display list
    (outputdisplaywidget.cpp:480-484), not the full survivor count.
    """
    lo, hi = window_slice(total, visible, top)
    if lo < 0:
        empty = df.limit(0)
        if with_prefix:
            # keep the schema identical to the non-empty path
            empty = empty.withColumn("display_prefix", F.lit(""))
        return empty
    out = with_global_index(df, "source_rank", ["line_no"], out="_rn").where(
        (F.col("_rn") >= lo) & (F.col("_rn") <= hi)
    )
    if with_prefix:
        width = len(str(hi - lo + 1))
        out = out.withColumn(
            "display_prefix",
            F.format_string(
                f"%0{width}d [%02d:%06d]",
                F.col("_rn") - F.lit(lo) + F.lit(1),
                F.col("source_rank"),
                F.col("line_no") + F.lit(1),
            ),
        )
    return out.orderBy(*ORDER_KEYS).drop("_rn")
