"""N1-N4: match navigation — point queries on derived state.

Reference walks an ordered per-filter line set with upper/lower_bound and
wraparound (OutputData.cpp:526-758). Batch analog: the routed sink already
holds every claimed span; navigation is two cheap aggregations over a
matches table (`min WHERE key > cur`, else global `min` for the wrap) —
served from a materialized matches sink at scale, partition-pruned by
filter_id, never a full scan of the fact table.

Coordinates: `line` is the OUTPUT index (position in the ordered surviving
set — the reference's m_filterLineMap stores output indices,
OutputData.cpp:309,315); char offsets are line-relative, and because the
span decomposition tiles each line exactly, a claimed subline's cumulative
char offset equals its span start.
"""

from __future__ import annotations

from typing import Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from txtlogparser_spark.operators.windowing import with_global_index


def with_output_index(routed: DataFrame) -> DataFrame:
    """Dense 0-based output index over the global order (source_rank,
    line_no) ↔ position in m_outputLinesAfterFilters.

    Scale shape: per-source row_number (parallel, partitioned window) +
    broadcast per-source cumulative offsets — no single-partition window
    (operators/windowing.with_global_index). The fact table is never
    funneled through one task; only a K-row source dim is."""
    return with_global_index(
        routed, "source_rank", ["line_no"], out="output_index"
    )


def matches_table(
    indexed: DataFrame, spans_col: str = "filter_spans", by_search: bool = False
) -> DataFrame:
    """Explode claimed spans → (matcher_id, output_index, start, end)."""
    key = "search_id" if by_search else "filter_id"
    sp = F.explode(spans_col).alias("sp")
    return (
        indexed.select("output_index", sp)
        .where(F.col(f"sp.{key}") != -1)
        .select(
            F.col(f"sp.{key}").alias("matcher_id"),
            "output_index",
            F.col("sp.start").alias("start"),
            F.col("sp.end").alias("end"),
        )
    )


def _first_span(df: DataFrame) -> Optional[Tuple[int, int, int]]:
    row = df.orderBy("output_index", "start").limit(1).collect()
    if not row:
        return None
    r = row[0]
    return (r["output_index"], r["start"], r["end"])


def _last_line_first_scan_reversed(df: DataFrame) -> Optional[Tuple[int, int, int]]:
    row = df.orderBy(F.desc("output_index"), F.desc("start")).limit(1).collect()
    if not row:
        return None
    r = row[0]
    return (r["output_index"], r["start"], r["end"])


def next_match(
    matches: DataFrame, matcher_id: int, line: int, char: int
) -> Optional[Tuple[int, int, int]]:
    """getNextMatchByFilter/Search (OutputData.cpp:526-575): first claimed
    span at (line, start>=char); else first span of the next matching line
    with wraparound to the globally first."""
    m = matches.where(F.col("matcher_id") == matcher_id)
    hit = _first_span(m.where((F.col("output_index") == line) & (F.col("start") >= char)))
    if hit:
        return hit
    hit = _first_span(m.where(F.col("output_index") > line))
    if hit:
        # first claimed span of that line
        return _first_span(m.where(F.col("output_index") == hit[0]))
    hit = _first_span(m)  # wrap
    if hit:
        return _first_span(m.where(F.col("output_index") == hit[0]))
    return None


def prev_match(
    matches: DataFrame, matcher_id: int, line: int, char: int
) -> Optional[Tuple[int, int, int]]:
    """getPreviousMatchByFilter/Search (OutputData.cpp:577-641): last claimed
    span at (line, start<char); else last span of the previous matching line
    with wraparound to the globally last."""
    m = matches.where(F.col("matcher_id") == matcher_id)
    row = (
        m.where((F.col("output_index") == line) & (F.col("start") < char))
        .orderBy(F.desc("start"))
        .limit(1)
        .collect()
    )
    if row:
        r = row[0]
        return (r["output_index"], r["start"], r["end"])
    row = (
        m.where(F.col("output_index") < line)
        .orderBy(F.desc("output_index"), F.desc("start"))
        .limit(1)
        .collect()
    )
    if not row:
        row = m.orderBy(F.desc("output_index"), F.desc("start")).limit(1).collect()  # wrap
    if not row:
        return None
    r = row[0]
    # last claimed span of that line (reverse scan, OutputData.cpp:616-628)
    return (r["output_index"], r["start"], r["end"])
