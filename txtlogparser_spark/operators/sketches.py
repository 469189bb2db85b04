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


# ---------------------------------------------------------------------------
# HyperLogLog: mergeable distinct-count sketch.
#
# The cardinality counterpart of the CM (frequency) and Bloom (membership)
# sketches above — "how many distinct tokens/URLs/fingerprints does this
# corpus/day/source hold?" at 100 TB. Exact COUNT(DISTINCT) shuffles one
# row per distinct item (billions at web scale); the HLL sketch bounds the
# exchange at 2^p register rows per task regardless of item count or skew
# (a hot item just re-maxes one register), and sketches from any number of
# partitions/days/corpora merge by per-register max (Flajolet et al. 2007,
# the same estimator behind Spark's approx_count_distinct — reimplemented
# here because the built-in's binary sketch is neither inspectable nor
# engine-portable, so the driver could never value-verify it).
#
# Determinism & portability: register addressing is the repo's standard
# md5-hex trick — bucket = first p/4 hex chars of md5(seed:item), rho =
# leading-zero count + 1 of the NEXT 52 bits (13 hex chars), computed
# JVM-side as 53 - length(bin(v)) (bin() renders without leading zeros in
# both engines; v = 0 → rho = 53). The estimator denominator sum(2^-rho)
# is kept EXACT by integer-scaling each term to 2^(53-rho) (a long ≤
# 2^52) summed as decimal — float summation would be partition-order
# nondeterministic and could not hash-match the oracle. The final
# estimate is one double division + the standard small-range linear
# counting correction, rounded to 4 decimals on both engines.
#
# Scale shape: build = one map-side pass -> groupBy(bucket) max with
# partial aggregation (shuffle <= 2^p rows per task); merge = union +
# re-max; estimate = a scalar aggregate over <= 2^p rows.
# ---------------------------------------------------------------------------

_HLL_W_HEX = 13  # 52-bit rho domain → rho ∈ [1, 53]


def _hll_registers(item: Column, p_bits: int, seed: str):
    """(bucket, rho) columns for one item. p_bits must be a multiple of
    4 so the bucket is a clean hex-prefix slice (engine-portable)."""
    if p_bits % 4 != 0 or not 4 <= p_bits <= 16:
        raise ValueError(f"p_bits must be a multiple of 4 in [4,16], got {p_bits}")
    h = F.md5(F.concat(F.lit(f"{seed}:"), item.cast("string")))
    bh = p_bits // 4
    bucket = F.conv(F.substring(h, 1, bh), 16, 10).cast("int")
    v = F.conv(F.substring(h, bh + 1, _HLL_W_HEX), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.bin(v)))
        .cast("int")
    )
    return bucket, rho


def hll_build(
    df: DataFrame,
    item_col: str = "item",
    p_bits: int = 12,
    seed: str = "hll-v1",
    group_cols: list | None = None,
) -> DataFrame:
    """HLL sketch of the items: (bucket:int, rho:int) register rows, one
    per NON-EMPTY register (absent register = 0). With `group_cols`, one
    independent sketch per group (the group keys prepend the schema) —
    the per-source / per-day form whose sketches later merge into the
    corpus total. Standard error ≈ 1.04/sqrt(2^p): p=12 → ~1.6%."""
    bucket, rho = _hll_registers(F.col(item_col), p_bits, seed)
    keys = list(group_cols or [])
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list | None = None) -> DataFrame:
    """Merge two sketches built with identical (p_bits, seed): union +
    per-register max. Lossless — merge(build(A), build(B)) is
    bit-identical to build(A ∪ B)."""
    keys = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    sketch: DataFrame,
    p_bits: int = 12,
    group_cols: list | None = None,
    out: str = "est_distinct",
) -> DataFrame:
    """Distinct-count estimate from a sketch: one row (or one per group)
    with `out` (double, rounded to 4 decimals) and `occupied` (long,
    non-zero registers — the sketch's own size/diagnostic).

    Estimator: E_raw = α_m·m²/Σ 2^-M_j with empty registers contributing
    2^0; linear counting m·ln(m/V) when E_raw ≤ 2.5m and V > 0 empty
    registers remain (the Flajolet small-range regime). The Σ is exact:
    terms integer-scaled by 2^53 (long ≤ 2^52 each) and summed as
    decimal, so the only float ops are one division (+ one ln on the
    small-range branch) — identical IEEE doubles in Spark and DuckDB."""
    m = 1 << p_bits
    alpha = 0.7213 / (1 + 1.079 / m)
    num = alpha * m * m * float(1 << 53)  # one python double literal
    keys = list(group_cols or [])
    # shiftleft with a COLUMN shift amount needs the SQL form (the
    # Python wrapper only takes an int literal)
    term = F.expr("shiftleft(1L, 53 - rho)").cast("decimal(20,0)")
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("occupied"),
        # empty sketch (keyless agg over zero rows): sum is NULL → 0
        F.coalesce(F.sum(term), F.lit(0).cast("decimal(30,0)")).alias("_s"),
    )
    vz = (F.lit(m) - F.col("occupied")).cast("long")
    denom = (
        vz.cast("decimal(10,0)")
        * F.lit(1 << 53).cast("decimal(20,0)")
        + F.col("_s")
    ).cast("double")
    raw = F.lit(num) / denom
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (vz > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / vz.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *keys, F.round(est, 4).alias(out), F.col("occupied")
    )
