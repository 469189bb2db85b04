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


def enrich_with_sources(
    facts: DataFrame,
    source_info: DataFrame,
    *,
    selected_only: bool = True,
    payload_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Inner-join facts to source_info(source, source_rank, selected, ...).

    `selected_only` prunes unselected sources with a pushed-down IN filter
    (partition pruning on a source-partitioned table) rather than relying
    on the join to drop them — the scan never reads pruned partitions.
    """
    dim = source_info
    if selected_only and "selected" in dim.columns:
        selected = [
            r["source"] for r in dim.where(F.col("selected")).select("source").collect()
        ]
        facts = facts.where(F.col("source").isin(selected))
        dim = dim.where(F.col("selected"))
    keep = ["source", "source_rank"] + list(
        payload_cols
        or [c for c in dim.columns if c not in ("source", "source_rank", "selected")]
    )
    dim = dim.select(*dict.fromkeys(keep))
    return facts.join(F.broadcast(dim), on="source", how="inner")
