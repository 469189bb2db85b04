"""HyperLogLog (operators/sketches.py): deterministic, mergeable,
engine-portable distinct counting — the cardinality sketch whose
register exchange is bounded at 2^p rows per task regardless of item
count or skew.

Pinned here: (1) register-exact agreement with an independent pure-
Python HLL model (same md5 spec), (2) merge(build(A), build(B)) ==
build(A ∪ B) bit-identical and grouped-sketch merge == global sketch,
(3) estimate accuracy within the sketch's design error on known
cardinalities across both estimator regimes (linear-counting small
range AND the raw-estimator range), (4) bit-exact DuckDB replay of the
register table and value-exact replay of the rounded estimate — the
same SQL shape the driver oracle uses, (5) input validation.
"""

import hashlib

import duckdb
import pytest

import pyspark.sql.functions as F

from txtlogparser_spark.operators.sketches import (
    hll_build,
    hll_estimate,
    hll_merge,
)

P = 12
M = 1 << P
SEED = "hll-v1"


def _py_registers(items, p_bits=P, seed=SEED):
    """Independent model of the register spec: bucket = first p/4 hex
    chars, rho = leading zeros + 1 of the next 52 bits."""
    regs = {}
    bh = p_bits // 4
    for it in items:
        h = hashlib.md5(f"{seed}:{it}".encode()).hexdigest()
        bucket = int(h[:bh], 16)
        v = int(h[bh : bh + 13], 16)
        rho = 53 if v == 0 else 53 - v.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_estimate(regs, p_bits=P):
    m = 1 << p_bits
    alpha = 0.7213 / (1 + 1.079 / m)
    num = alpha * m * m * float(1 << 53)
    s = sum(1 << (53 - r) for r in regs.values())
    vz = m - len(regs)
    raw = num / float(vz * (1 << 53) + s)
    if raw <= 2.5 * m and vz > 0:
        import math

        return round(m * math.log(m / vz), 4)
    return round(raw, 4)


def _items(n, tag="it"):
    return [f"{tag}-{i}" for i in range(n)]


def _sk(df):
    return sorted(map(tuple, df.collect()))


class TestRegisters:
    def test_matches_python_model(self, spark):
        items = _items(3000)
        df = spark.createDataFrame([(i,) for i in items], "item string")
        got = dict(_sk(hll_build(df, "item")))
        assert got == _py_registers(items)

    def test_duplicates_do_not_change_registers(self, spark):
        items = _items(500)
        once = spark.createDataFrame([(i,) for i in items], "item string")
        thrice = spark.createDataFrame(
            [(i,) for i in items * 3], "item string"
        )
        assert _sk(hll_build(once, "item")) == _sk(hll_build(thrice, "item"))

    def test_validation(self, spark):
        df = spark.createDataFrame([("x",)], "item string")
        with pytest.raises(ValueError, match="p_bits"):
            hll_build(df, "item", p_bits=10)


class TestMerge:
    def test_merge_equals_build_on_union(self, spark):
        a = spark.createDataFrame([(i,) for i in _items(800, "a")], "item string")
        b = spark.createDataFrame(
            # overlap: half of b is a's items
            [(i,) for i in _items(400, "a") + _items(400, "b")], "item string"
        )
        merged = hll_merge(hll_build(a, "item"), hll_build(b, "item"))
        direct = hll_build(a.unionByName(b), "item")
        assert _sk(merged) == _sk(direct)

    def test_grouped_sketches_merge_to_global(self, spark):
        rows = [(f"s{i % 3}", f"w-{i % 700}") for i in range(2100)]
        df = spark.createDataFrame(rows, "source string, item string")
        per_group = hll_build(df, "item", group_cols=["source"])
        folded = (
            per_group.groupBy("bucket").agg(F.max("rho").alias("rho"))
        )
        assert _sk(folded) == _sk(hll_build(df, "item"))


class TestEstimate:
    @pytest.mark.parametrize("n", [100, 2500, 60000])
    def test_accuracy_both_regimes(self, spark, n):
        # p=12 → std err ~1.6%; 60000 >> 2.5m exercises the raw branch,
        # 100 and 2500 the linear-counting branch. Deterministic, so the
        # 5% bound is a pinned property, not a flaky statistical one.
        df = spark.createDataFrame([(i,) for i in _items(n)], "item string")
        est = hll_estimate(hll_build(df, "item")).collect()[0]
        assert abs(est["est_distinct"] - n) / n < 0.05
        assert est["est_distinct"] == _py_estimate(_py_registers(_items(n)))

    def test_grouped_estimate(self, spark):
        rows = [("a", f"x-{i}") for i in range(300)] + [
            ("b", f"y-{i}") for i in range(900)
        ]
        df = spark.createDataFrame(rows, "source string, item string")
        got = {
            r["source"]: r["est_distinct"]
            for r in hll_estimate(
                hll_build(df, "item", group_cols=["source"]),
                group_cols=["source"],
            ).collect()
        }
        assert abs(got["a"] - 300) / 300 < 0.05
        assert abs(got["b"] - 900) / 900 < 0.05

    def test_empty_sketch(self, spark):
        df = spark.createDataFrame([], "item string")
        est = hll_estimate(hll_build(df, "item")).collect()
        # groupBy().agg over an empty grouped frame with no keys yields
        # one row of count=0 in Spark only when grouping keys exist;
        # keyless agg always yields one row
        assert len(est) == 1 and est[0]["est_distinct"] == 0.0


class TestDuckDBParity:
    SKETCH_SQL = f"""
        SELECT
          CAST(CAST(('0x' || substr(md5('{SEED}:' || item), 1, {P // 4}))
               AS BIGINT) AS INTEGER) AS bucket,
          CAST(MAX(CASE
            WHEN CAST(('0x' || substr(md5('{SEED}:' || item), {P // 4 + 1}, 13))
                 AS BIGINT) = 0 THEN 53
            ELSE 53 - length(bin(CAST(('0x' ||
                 substr(md5('{SEED}:' || item), {P // 4 + 1}, 13)) AS BIGINT)))
          END) AS INTEGER) AS rho
        FROM items GROUP BY 1
    """

    def test_sketch_and_estimate_replay(self, spark):
        items = _items(4000)
        df = spark.createDataFrame([(i,) for i in items], "item string")
        sk = hll_build(df, "item")
        est = hll_estimate(sk).collect()[0]

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE items AS SELECT * FROM (VALUES "
            + ",".join(f"('{i}')" for i in items)
            + ") t(item)"
        )
        oracle_regs = sorted(
            map(tuple, con.execute(self.SKETCH_SQL).fetchall())
        )
        assert oracle_regs == _sk(sk)

        alpha = 0.7213 / (1 + 1.079 / M)
        num = alpha * M * M * float(1 << 53)
        oest = con.execute(
            f"""
            WITH sk AS ({self.SKETCH_SQL}),
            agg AS (
              SELECT COUNT(*) AS occupied,
                SUM(1::BIGINT << (53 - rho)) AS s
              FROM sk
            )
            SELECT CASE
              WHEN {num!r} / CAST(({M} - occupied)::HUGEINT *
                   9007199254740992::HUGEINT + s AS DOUBLE) <= {2.5 * M}
                   AND ({M} - occupied) > 0
              THEN round({float(M)} * ln({float(M)} /
                   CAST({M} - occupied AS DOUBLE)), 4)
              ELSE round({num!r} / CAST(({M} - occupied)::HUGEINT *
                   9007199254740992::HUGEINT + s AS DOUBLE), 4)
            END AS est, occupied FROM agg
            """
        ).fetchone()
        assert oest[0] == est["est_distinct"]
        assert oest[1] == est["occupied"]
