"""W1: display window over the global total order (source_rank, line_no).

OutputWindow semantics (OutputWindow.cpp:22-45): a [top, bottom] inclusive
slice of the ordered surviving set, visibleLineCount=100000
(OutputWindow.h:27), with end-clamping.

Spark shape: `ORDER BY (source_rank, line_no) LIMIT k` compiles to
TakeOrderedAndProject — a per-partition top-k + driver merge, NOT a global
sort; offset pages use the same top-(top+count) plan with a row_number
trim. At 100 TB the page is O(window) not O(table), because top-k never
shuffles the full data set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from txtlogparser_spark.oracle.pipeline import VISIBLE_LINE_COUNT, window_slice

ORDER_KEYS = ["source_rank", "line_no"]


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

    `total` is the surviving-line count (drives the clamp + prefix width,
    outputdisplaywidget.cpp:480-484).
    """
    lo, hi = window_slice(total, visible, top)
    if lo < 0:
        return df.limit(0)
    w = Window.orderBy(*[F.col(k) for k in ORDER_KEYS])
    out = (
        df.withColumn("_rn", F.row_number().over(w) - 1)
        .where((F.col("_rn") >= lo) & (F.col("_rn") <= hi))
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
