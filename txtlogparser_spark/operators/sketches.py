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


# ---------------------------------------------------------------------------
# Bloom filter: mergeable set-membership sketch.
#
# The membership counterpart of the CM sketch above, for the incremental-
# curation join nobody can afford at 100 TB: "is this arriving document's
# digest already in the curated corpus?" A raw anti-join shuffles the whole
# arriving shard against the whole historical digest set; a Bloom filter of
# the historical set is m/8 bytes total, broadcasts to every task, and
# turns the check into a map-side probe — only the (tiny) maybe-member
# fraction proceeds to the exact verify join. No false negatives by
# construction, so the verify stage sees every true duplicate.
#
# Determinism & portability: positions come from the repo's standard
# md5-hex trick (hash i of v = first 15 hex chars of md5('seed:i:' || v)
# mod m), and the bit array is packed 63 bits per BIGINT block —
# 63, not 64, because DuckDB's `1::BIGINT << 63` raises Out of Range
# (signed overflow) while bit 62 is safe in both engines; the packing is
# a storage choice, invisible to membership semantics. The whole filter
# (positions, blocks, false positives) therefore replays bit-exactly in
# the DuckDB oracle.
#
# Scale shape: build = explode(k positions per item) -> groupBy(block)
# bit_or with map-side partial combine (shuffle <= ceil(m/63) rows per
# task regardless of item count or skew); merge = union + bit_or (the
# per-day/per-corpus filters compose); probe = k BROADCAST joins on the
# block id — zero Exchange on the probed fact table (pinned in
# tests/test_bloom.py).
# ---------------------------------------------------------------------------

_BLOCK_BITS = 63


def _bloom_pos(item: Column, i: int, m_bits: int, seed: str) -> Column:
    """Position of hash i for an item: first 15 md5 hex chars (60 bits —
    modulo bias < 2^-40 for any practical m) mod m_bits. DuckDB replay:
    CAST(('0x' || substr(md5(seed||':'||i||':'||v), 1, 15)) AS BIGINT)
    % m_bits."""
    h = F.md5(F.concat(F.lit(f"{seed}:{i}:"), item.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m_bits


def bloom_build(
    df: DataFrame,
    item_col: str = "item",
    m_bits: int = 1 << 18,
    k: int = 4,
    seed: str = "bloom-v1",
) -> DataFrame:
    """Bloom filter of the items: (block:long, bits:long) rows, one per
    NON-EMPTY 63-bit block (absent block = all zero). Size the filter
    with the usual calculus: m ≈ -n·ln(p)/ln(2)², k ≈ (m/n)·ln(2);
    10 bits/key + k=7 gives p≈1%, k=4 at 10 bits/key ≈ 1.2%."""
    if m_bits < 1 or k < 1:
        raise ValueError(f"need m_bits>=1 and k>=1, got {m_bits}, {k}")
    item = F.col(item_col)
    pos = df.select(
        F.explode(
            F.array(*[_bloom_pos(item, i, m_bits, seed) for i in range(k)])
        ).alias("p")
    )
    return (
        pos.select(
            F.expr(f"p DIV {_BLOCK_BITS}").alias("block"),
            (F.col("p") % _BLOCK_BITS).cast("int").alias("b"),
        )
        .groupBy("block")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), b)")).alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two filters built with identical (m_bits, k, seed)."""
    return (
        a.unionByName(b).groupBy("block").agg(F.bit_or("bits").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    item_col: str,
    filt: DataFrame,
    m_bits: int = 1 << 18,
    k: int = 4,
    seed: str = "bloom-v1",
    out: str = "maybe_member",
) -> DataFrame:
    """Append `out`: True iff ALL k bits for df[item_col] are set in the
    filter — i.e. maybe-member (no false negatives; false positives at
    the filter's design rate). Plan shape: k broadcast left joins on the
    block id, so the probed table never shuffles; the filter (≤ m/63
    rows ≈ m/8 bytes) broadcasts once per join."""
    item = F.col(item_col)
    hits = []
    res = df
    tmp = []
    for i in range(k):
        p, blk, bw = f"_bfp{i}", f"_bfb{i}", f"_bfw{i}"
        tmp += [p, blk, bw]
        res = res.withColumn(p, _bloom_pos(item, i, m_bits, seed))
        res = res.withColumn(blk, F.expr(f"{p} DIV {_BLOCK_BITS}"))
        f = filt.select(F.col("block").alias(blk), F.col("bits").alias(bw))
        res = res.join(F.broadcast(f), blk, "left")
        hits.append(
            F.coalesce(
                F.expr(
                    f"(shiftright({bw}, CAST({p} % {_BLOCK_BITS} AS INT)) & 1)"
                    " = 1"
                ),
                F.lit(False),
            )
        )
    cond = hits[0]
    for h in hits[1:]:
        cond = cond & h
    return res.withColumn(out, cond).drop(*tmp)
