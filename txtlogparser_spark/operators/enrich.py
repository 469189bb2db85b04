"""Broadcast enrichment against the source-keyed lookup table.

The reference's per-file metadata (FileData.h:66-73: fileRow display order,
selected flag) becomes a small dimension table joined via BROADCAST hash
join — the build side is one row per source, so no shuffle of the fact
table ever happens for enrichment. Source de-selection (S2,
WorkspaceData.cpp:149-159) is a partition-prunable filter applied BEFORE
the join so Catalyst pushes it into the scan of a source-partitioned table.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def selected_sources(source_info: DataFrame) -> Optional[list]:
    """Driver-side S2 rule, in ONE place: the selected-source list (None
    when the dim carries no `selected` column). One tiny collect on the
    K-row dim — callers that prune AND enrich in the same plan should
    compute this once and pass it to enrich_with_sources, not collect
    twice."""
    if "selected" not in source_info.columns:
        return None
    return [
        r["source"]
        for r in source_info.where(F.col("selected")).select("source").collect()
    ]


def enrich_with_sources(
    facts: DataFrame,
    source_info: DataFrame,
    *,
    selected_only: bool = True,
    payload_cols: Optional[Sequence[str]] = None,
    selected: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Inner-join facts to source_info(source, source_rank, selected, ...).

    `selected_only` prunes unselected sources with a pushed-down IN filter
    (partition pruning on a source-partitioned table) rather than relying
    on the join to drop them — the scan never reads pruned partitions.
    `selected` short-circuits the dim collect when the caller already
    computed selected_sources()."""
    dim = source_info
    if selected_only and "selected" in dim.columns:
        if selected is None:
            selected = selected_sources(dim)
        facts = facts.where(F.col("source").isin(list(selected)))
        dim = dim.where(F.col("selected"))
    keep = ["source", "source_rank"] + list(
        payload_cols
        or [c for c in dim.columns if c not in ("source", "source_rank", "selected")]
    )
    dim = dim.select(*dict.fromkeys(keep))
    return facts.join(F.broadcast(dim), on="source", how="inner")
