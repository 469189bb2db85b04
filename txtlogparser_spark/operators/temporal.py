"""Temporal joins Spark lacks as builtins, in their scale-out shapes.

- asof_join: for every left row, the single right row with the greatest
  timestamp at-or-before it (direction='backward'; 'forward' = least
  at-or-after), per key. NOT implemented as an inequality join (which
  Catalyst executes as a nested loop / per-key cross product): both
  sides are tagged, unioned, and resolved with ONE window pass —
  last(right_payload, ignorenulls) over rows-unbounded-preceding — so
  the cost is one shuffle on the key plus a per-key sort, the same
  shape Flink's temporal join and pandas merge_asof distribute to.
- bucketed_range_join: point-in-interval join. Intervals are exploded
  to the fixed-width buckets they cover; each point carries its single
  bucket; the join is an EQUI-join on (keys…, bucket) followed by the
  exact containment filter. A point maps to exactly one bucket, so no
  dedup is needed, and the O(points × intervals) nested loop a raw
  `p BETWEEN s AND e` condition produces never appears in the plan.

Skew note (100 TB): both operators shuffle on the join key. A hot key
(one user with a billion events) serializes that key's window/sort onto
one task; mitigate upstream by splitting hot keys into time-sliced
sub-keys (the asof result is unaffected as long as slices overlap by
one right row) — the same salting discipline the route pipeline uses.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str],
    direction: str = "backward",
    allow_exact: bool = True,
    suffix: str = "_r",
) -> DataFrame:
    """Left-join semantics: every left row survives; the matched right
    columns (suffixed) are NULL when no right row qualifies. Ties among
    right rows with identical timestamps are broken deterministically in
    favor of the row sorting LAST by (right_cols…) — dedupe the right
    side per (key, ts) first if a specific winner is required."""
    if isinstance(on, str):
        on = [on]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_r_pay")
    # unified frame: key cols + event time + side tag + both payloads
    l_half = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_l"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l_pay"),
        F.lit(None).cast(
            # the DataType OBJECT — a simpleString round-trip breaks on
            # column names that need backquotes (spaces, dots)
            right.select(payload).schema["_r_pay"].dataType
        ).alias("_r_pay"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tie_{i}")
          for i, c in enumerate(right_cols)],
    )
    r_half = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_l"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("_l_pay"))
            .schema["_l_pay"].dataType
        ).alias("_l_pay"),
        payload,
        *[F.col(c).alias(f"_tie_{i}") for i, c in enumerate(right_cols)],
    )
    both = l_half.unionByName(r_half)

    # ordering: right rows that a left row may see must sort BEFORE it.
    # backward+exact: right(ts<=t) visible → at equal ts right first
    #   (_is_l asc); strict: left first (_is_l desc).
    # forward mirrors with ts descending.
    t_ord = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    side = F.col("_is_l").asc() if allow_exact else F.col("_is_l").desc()
    ties = [F.col(f"_tie_{i}").asc_nulls_first() for i in range(len(right_cols))]
    w = (
        Window.partitionBy(*[F.col(k) for k in on])
        .orderBy(t_ord, side, *ties)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = both.withColumn("_match", F.last("_r_pay", ignorenulls=True).over(w))
    out = resolved.where(F.col("_is_l") == 1).select(
        *[F.col("_l_pay")[c].alias(c) for c in lcols],
        *[F.col("_match")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner join of points to every interval containing them
    (start ≤ point ≤ end, plus equality on `keys`). `point_col`,
    `start_col`, `end_col` must be integral (callers convert timestamps
    with unix_micros/unix_seconds). `bucket` trades shuffle width
    against candidate precision: an interval emits span/bucket + 1
    bucket rows; a candidate (point, interval) pair is enumerated at
    most once because the point lives in exactly one bucket."""
    if bucket <= 0:
        raise ValueError("bucket must be positive")
    p = points.withColumn("_bkt", F.floor(F.col(point_col) / bucket))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket), F.floor(F.col(end_col) / bucket)
            )
        ),
    )
    joined = p.join(iv, [*keys, "_bkt"]).where(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_bkt")
