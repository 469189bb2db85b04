"""Temperature-based source mixing (operators/sampling.py::
temperature_mix): the mT5/XLM-R alpha-scaling recipe with the repo's
deterministic md5-hex selection.

Pinned here: (1) rate math against an independent Python model
(including the alpha=1 natural / alpha=0 uniform endpoints, the clip
at 1.0, and the token-weighted form), (2) the selected SET equals the
Python model's set exactly (same md5 threshold), (3) partition
invariance, (4) bit-exact DuckDB replay of the selected set, (5) the
fact-table side of the plan carries no window/sort — mass dim +
broadcast joins only, (6) validation.
"""

import hashlib
import math

import duckdb
import pytest

from txtlogparser_spark.operators.sampling import temperature_mix

_U32 = 1 << 32
SALT = "tmix-v1"


def _py_rates(masses, alpha, target):
    # mirror the operator exactly: quantized-integer normalizer sum
    z = sum(math.floor((m**alpha) * (1 << 30)) for m in masses.values()) / float(
        1 << 30
    )
    t = float(target if target is not None else sum(masses.values()))
    return {
        s: min(1.0, t * (m**alpha) / z / m) for s, m in masses.items()
    }


def _py_select(rows, rates, key_idx=0, src_idx=1):
    out = []
    for r in rows:
        thr = format(math.floor(rates[r[src_idx]] * _U32), "09x")
        h = "0" + hashlib.md5(f"{SALT}:{r[key_idx]}".encode()).hexdigest()[:8]
        if h < thr:
            out.append(r[key_idx])
    return sorted(out)


def _rows(n_per_src):
    rows, i = [], 0
    for s, n in n_per_src.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    return rows


class TestRates:
    def test_alpha_endpoints_and_clip(self, spark):
        counts = {"a": 800, "b": 150, "c": 50}
        rows = _rows(counts)
        df = spark.createDataFrame(rows, "doc_id long, source string")
        for alpha, target in [(1.0, None), (0.0, 600), (0.5, 400), (0.3, 5000)]:
            out = temperature_mix(df, alpha=alpha, target_rows=target)
            got = {
                r["source"]: r["t_rate"]
                for r in out.select("source", "t_rate").distinct().collect()
            }
            exp = _py_rates({k: float(v) for k, v in counts.items()}, alpha, target)
            for s in got:
                assert got[s] == pytest.approx(exp[s], abs=1e-12)
            if alpha == 1.0:
                assert all(abs(v - 1.0) < 1e-12 for v in got.values())
            if target == 5000:  # over-ask: every rate clips at 1.0
                assert all(v == 1.0 for v in got.values())

    def test_selected_set_matches_python_model(self, spark):
        counts = {"a": 700, "b": 200, "c": 100}
        rows = _rows(counts)
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = temperature_mix(df, alpha=0.5, target_rows=500)
        got = sorted(r["doc_id"] for r in out.collect())
        exp_rates = _py_rates({k: float(v) for k, v in counts.items()}, 0.5, 500)
        assert got == _py_select(rows, exp_rates)
        # alpha up-weights the tail: c's keep-rate beats a's
        rates = {
            r["source"]: r["t_rate"]
            for r in out.select("source", "t_rate").distinct().collect()
        }
        assert rates["c"] > rates["b"] > rates["a"]

    def test_weighted_form(self, spark):
        rows = [(i, "a" if i < 10 else "b", 100 + i) for i in range(15)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
        out = temperature_mix(df, alpha=0.5, target_rows=10, weight_col="n_tok")
        masses = {
            "a": float(sum(r[2] for r in rows if r[1] == "a")),
            "b": float(sum(r[2] for r in rows if r[1] == "b")),
        }
        exp = _py_rates(masses, 0.5, 10)
        got = {
            r["source"]: r["t_rate"]
            for r in out.select("source", "t_rate").distinct().collect()
        }
        for s in got:
            assert got[s] == pytest.approx(exp[s], abs=1e-12)

    def test_partition_invariance(self, spark):
        rows = _rows({"a": 400, "b": 100})
        a = spark.createDataFrame(rows, "doc_id long, source string").repartition(1)
        b = spark.createDataFrame(rows, "doc_id long, source string").repartition(13)
        sa = sorted(r["doc_id"] for r in temperature_mix(a, 0.5, 300).collect())
        sb = sorted(r["doc_id"] for r in temperature_mix(b, 0.5, 300).collect())
        assert sa == sb

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with pytest.raises(ValueError, match="alpha"):
            temperature_mix(df, alpha=-0.1)


class TestPlan:
    def test_no_window_no_sort(self, spark):
        df = spark.createDataFrame(_rows({"a": 50, "b": 20}), "doc_id long, source string")
        plan = (
            temperature_mix(df, 0.5, 30)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan and "Sort" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


class TestDuckDBParity:
    def test_selected_set_replays(self, spark):
        counts = {"a": 300, "b": 120, "c": 37}
        rows = _rows(counts)
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = sorted(r["doc_id"] for r in temperature_mix(df, 0.5, 250).collect())
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, '{s}')" for i, s in rows)
            + ") v(doc_id, source)"
        )
        oracle = [
            r[0]
            for r in con.execute(
                f"""
            WITH cnt AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
                         FROM t GROUP BY 1),
            z AS (SELECT SUM(CAST(floor(sqrt(n) * 1073741824.0) AS BIGINT))
                         / 1073741824.0 AS z FROM cnt),
            rates AS (
              SELECT source,
                least(1.0, 250.0 * sqrt(n) / z / n) AS t_rate
              FROM cnt CROSS JOIN z
            )
            SELECT doc_id FROM t JOIN rates USING (source)
            WHERE '0' || substr(md5('{SALT}:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  < lpad(lower(hex(CAST(floor(t_rate * 4294967296.0) AS BIGINT))), 9, '0')
            ORDER BY doc_id
            """
            ).fetchall()
        ]
        assert got == oracle


class TestZeroMassGroups:
    def test_zero_weight_group_gets_rate_zero_not_divide_by_zero(self, spark):
        # review finding: a group whose weight_col sums to 0 (or NULL)
        # aborted the job with ANSI DIVIDE_BY_ZERO at the rate expression
        rows = [(i, "live", 10.0) for i in range(50)] + [
            (100 + i, "dead", 0.0) for i in range(5)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, w double")
        out = temperature_mix(
            df, alpha=0.5, weight_col="w", target_rows=25
        ).collect()
        assert out, "live group must still be sampled"
        assert all(r["source"] == "live" for r in out), (
            "zero-mass group must be rate-0, not crash or leak rows"
        )

    def test_all_null_weight_group(self, spark):
        rows = [(i, "live", 10.0) for i in range(50)] + [
            (100 + i, "nullw", None) for i in range(5)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, w double")
        out = temperature_mix(df, alpha=1.0, weight_col="w").collect()
        assert all(r["source"] == "live" for r in out)


class TestNullSourceGroup:
    def test_null_source_is_a_group_of_its_own(self, spark):
        # second review pass: NULL-source rows used to vanish through
        # the equi-join while their mass still deflated every real
        # group's rate through the normalizer
        rows = [(i, "live") for i in range(50)] + [(100 + i, None) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = temperature_mix(df, alpha=1.0).collect()
        # alpha=1, target=input count -> natural distribution, every
        # group's rate is exactly 1.0: ALL rows survive
        assert len(out) == 100
        assert sum(1 for r in out if r["source"] is None) == 50
