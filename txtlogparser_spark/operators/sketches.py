"""Mergeable frequency sketches for corpus statistics at 100 TB.

Exact per-item counting shuffles one key per distinct item — fine for a
fixture vocabulary, hostile at open-vocabulary web scale (billions of
distinct tokens/URLs/fingerprints). A count-min sketch bounds the
shuffle by the SKETCH size instead: every task partially aggregates
into at most depth × width cells, the exchange moves only those cells,
and sketches from any number of partitions/days/corpora merge by cell
addition (the classic Cormode-Muthukrishnan CM sketch).

Determinism & portability: cell hashing is the repo's standard
md5-hex-prefix trick (row d hashes item through md5(d ':' item)), so
DuckDB replays the exact same sketch and the driver verifies VALUES,
not just shapes. Estimates are the usual min-over-rows upper bounds:
est >= true always, over-counting bounded by collisions.

Scale shape: build = explode(depth rows per item) → groupBy (row, col)
with map-side combine (shuffle <= depth × width per task, independent
of item count or skew — a hot word just increments one cell). query =
the finished sketch is at most depth × width rows → broadcast to the
probe side, per-item min over depth cells.

Reference parity: TxtLogParser counts per-filter occurrences exactly
(OutputData.cpp aggregation maps); the sketch is the training-pipeline
extension for when the key space itself is web-scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _cell(item: Column, d: int, width: int) -> Column:
    """Row-d cell index of an item: first 8 md5 hex chars mod width.
    Engine-portable (DuckDB: CAST('0x' || substr(md5(...),1,8) AS
    BIGINT) % width)."""
    h = F.md5(F.concat(F.lit(f"{d}:"), item.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_build(
    df: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch of an item stream: (d, c, cnt) cells, one row
    per NON-EMPTY cell (absent cell = 0). Mergeable: union two sketches
    and re-groupBy-sum."""
    item = F.col(item_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cell(item, d, width).alias("c")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("h")
    )
    return cells.groupBy(
        F.col("h.d").alias("d"), F.col("h.c").alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (depth, width)."""
    return (
        a.unionByName(b)
        .groupBy("d", "c")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query estimates, SET semantics: one output row per
    DISTINCT queried item (the input is deduped and extra columns
    dropped — join the result back by item if per-row alignment is
    needed). est = min over rows d of the (d, hash_d(item)) cell. The
    sketch (<= depth x width rows) broadcasts; the probe explodes depth
    rows per item and re-aggregates min — absent cells count as 0
    (cannot happen for items that were actually inserted)."""
    item = F.col(item_col)
    queries = queries.select(item_col).distinct()
    probes = queries.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cell(item, d, width).alias("c")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("h"),
    ).select(item_col, F.col("h.d").alias("d"), F.col("h.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["d", "c"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_n"))
    )
