"""Bloom filter (operators/sketches.py): deterministic, mergeable,
engine-portable set membership — the broadcastable summary that makes
incremental dedup against a huge prior corpus a map-side probe.

Pinned here: (1) no false negatives and build/merge equivalence, (2)
bit-exact DuckDB replay of blocks AND membership decisions (the same
63-bit-block packing the driver oracle uses — bit 63 would overflow
DuckDB's BIGINT shift), (3) the probe plan never shuffles the probed
fact table (broadcast joins only), (4) input validation.
"""

from contextlib import contextmanager

import duckdb
import pytest

import pyspark.sql.functions as F

from txtlogparser_spark.operators.sketches import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)

M, K = 4096, 4


@contextmanager
def _no_aqe(spark):
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


@pytest.fixture(scope="module")
def keys(spark):
    # 400 member digests (ids 0..399), probes 200..799 → 200 members
    members = spark.range(0, 400).select(
        F.md5(F.col("id").cast("string")).alias("dg")
    )
    probes = spark.range(200, 800).select(
        "id", F.md5(F.col("id").cast("string")).alias("dg")
    )
    return members, probes


class TestBloomSemantics:
    def test_no_false_negatives(self, spark, keys):
        members, probes = keys
        filt = bloom_build(members, "dg", m_bits=M, k=K)
        got = bloom_probe(probes, "dg", filt, m_bits=M, k=K).collect()
        for r in got:
            if r["id"] < 400:
                assert r["maybe_member"], r
        # fp rate sanity: 400 keys in 4096 bits at k=4 → p ≈ 2.4%;
        # assert well under 10% so a hashing bug (everything hits)
        # cannot pass
        fps = sum(1 for r in got if r["id"] >= 400 and r["maybe_member"])
        assert fps / 400 < 0.10, fps

    def test_merge_equals_build_on_union(self, spark, keys):
        members, _ = keys
        a = members.filter(F.col("dg") < "8")
        b = members.filter(F.col("dg") >= "8")
        merged = bloom_merge(
            bloom_build(a, "dg", m_bits=M, k=K),
            bloom_build(b, "dg", m_bits=M, k=K),
        )
        whole = bloom_build(members, "dg", m_bits=M, k=K)
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0

    def test_validation(self, spark, keys):
        members, _ = keys
        with pytest.raises(ValueError):
            bloom_build(members, "dg", m_bits=0)
        with pytest.raises(ValueError):
            bloom_build(members, "dg", k=0)


class TestBloomDuckDBParity:
    """The exact filter cells and every membership decision replay in
    DuckDB — same md5 position hashing, same 63-bit block packing."""

    def test_blocks_and_membership_match(self, spark, keys):
        members, probes = keys
        filt = bloom_build(members, "dg", m_bits=M, k=K)
        got_blocks = sorted(
            (r["block"], r["bits"]) for r in filt.collect()
        )
        got_probe = sorted(
            (r["id"], r["maybe_member"])
            for r in bloom_probe(probes, "dg", filt, m_bits=M, k=K).collect()
        )
        con = duckdb.connect()
        base = f"""
            WITH members AS (
              SELECT md5(CAST(r AS VARCHAR)) AS dg FROM range(0, 400) t(r)),
            probes AS (
              SELECT r AS id, md5(CAST(r AS VARCHAR)) AS dg
              FROM range(200, 800) t(r)),
            bpos AS (
              SELECT CAST(('0x' || substr(md5('bloom-v1:' || i || ':' || dg),
                                          1, 15)) AS BIGINT) % {M} AS p
              FROM members, unnest(range(0, {K})) AS t(i)),
            filt AS (
              SELECT p // 63 AS block,
                bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS bits
              FROM bpos GROUP BY 1)
        """
        want_blocks = sorted(
            (int(b), int(w))
            for b, w in con.execute(
                base + "SELECT block, bits FROM filt"
            ).fetchall()
        )
        assert got_blocks == want_blocks
        want_probe = sorted(
            (int(i), bool(m))
            for i, m in con.execute(
                base
                + f"""
                , pr AS (
                  SELECT id,
                    CAST(('0x' || substr(md5('bloom-v1:' || t.i || ':' || dg),
                                         1, 15)) AS BIGINT) % {M} AS p
                  FROM probes, unnest(range(0, {K})) AS t(i))
                SELECT id,
                  BOOL_AND(COALESCE((f.bits >> CAST(p % 63 AS INT)) & 1, 0) = 1)
                FROM pr LEFT JOIN filt f ON f.block = p // 63
                GROUP BY id
                """
            ).fetchall()
        )
        assert got_probe == want_probe


class TestBloomPlan:
    def test_probe_never_shuffles_fact(self, spark, keys, tmp_path):
        """With the filter materialized (the production shape — built
        once, persisted, reused per arriving shard), the probe plan is
        k broadcast joins: zero shuffle Exchanges anywhere, and none on
        the fact lineage in particular."""
        members, probes = keys
        bloom_build(members, "dg", m_bits=M, k=K).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "filt"))
        filt = spark.read.parquet(str(tmp_path / "filt"))
        fact = probes.write.mode("overwrite").parquet(str(tmp_path / "fact"))
        fact = spark.read.parquet(str(tmp_path / "fact"))
        with _no_aqe(spark):
            probed = bloom_probe(fact, "dg", filt, m_bits=M, k=K)
            probed.collect()
            plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert plan.count("BroadcastExchange") == K, plan
