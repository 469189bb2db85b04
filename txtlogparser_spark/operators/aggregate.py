"""Per-filter / per-search aggregates (A1-A3).

Reference state: m_filterMatchCount counts claimed SPANS (occurrences,
OutputData.cpp:314), m_filterLineMap is the set of matched output lines
(OutputData.cpp:315); searches likewise over the filtered set
(OutputData.cpp:373-374).

Spark shape: explode the span arrays → hash aggregate. Catalyst plans this
as partial (map-side) + final aggregation automatically — no custom combine
logic needed, and it scales: the shuffle carries only
(filter_id, partial_count) per task, not rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def filter_metrics(routed: DataFrame, spans_col: str = "filter_spans") -> DataFrame:
    """occurrence_count = claimed spans; line_count = distinct matched lines.

    `routed` must already be the surviving set with `doc_id` unique per line.
    """
    sp = F.explode(spans_col).alias("sp")
    return (
        routed.select("doc_id", sp)
        .where(F.col("sp.filter_id") != -1)
        .groupBy(F.col("sp.filter_id").alias("filter_id"))
        .agg(
            F.count(F.lit(1)).alias("occurrence_count"),
            F.countDistinct("doc_id").alias("line_count"),
        )
    )


def search_metrics(annotated: DataFrame, spans_col: str = "search_spans") -> DataFrame:
    sp = F.explode(spans_col).alias("sp")
    return (
        annotated.select("doc_id", sp)
        .where(F.col("sp.search_id") != -1)
        .groupBy(F.col("sp.search_id").alias("search_id"))
        .agg(
            F.count(F.lit(1)).alias("occurrence_count"),
            F.countDistinct("doc_id").alias("line_count"),
        )
    )
