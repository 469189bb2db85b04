"""Token-array-native n-gram dedup (operators/dedup.py::
token_ngram_dup_stats / token_ngram_dedup): MassiveText-style exact
gram overlap computed directly over tokens:array<int> — the form the
north-star's pre-tokenized input actually needs.

Pinned here: (1) semantics against an independent Python model
(identical copies, partial overlap fractions, shorter-than-n docs,
first-occurrence-keeps), (2) partition invariance, (3) bit-exact
DuckDB replay of counts, fractions and verdicts, (4) the keeper
election is a partial aggregation — no Window over the gram table,
(5) the dedup stage keeps exactly the non-dup rows.
"""

import hashlib

import duckdb

from txtlogparser_spark.operators.dedup import (
    token_ngram_dedup,
    token_ngram_dup_stats,
)

N = 4
THR = 0.5


def _py_stats(docs, n=N, thr=THR):
    grams = {}
    per_doc = {}
    for doc_id, toks in sorted(docs):
        gs = {
            hashlib.md5(
                ",".join(map(str, toks[i : i + n])).encode()
            ).hexdigest()
            for i in range(len(toks) - n + 1)
        }
        per_doc[doc_id] = gs
        for g in gs:
            grams.setdefault(g, doc_id)
    out = []
    for doc_id, gs in per_doc.items():
        dup = sum(1 for g in gs if grams[g] < doc_id)
        frac = round(dup / len(gs), 6) if gs else 0.0
        out.append((doc_id, len(gs), dup, frac, frac >= thr))
    return sorted(out)


def _docs():
    base = list(range(100, 120))
    return [
        (0, base),                     # original
        (1, base[:]),                  # identical -> full dup
        (2, base[:10] + [999] * 10),   # half overlap
        (3, [1, 2, 3]),                # shorter than n -> no grams
        (4, [7] * 8),                  # self-repeating (distinct grams collapse)
        (5, [999] * 10 + base[:10]),   # same grams as 2, reordered join
    ]


def _got(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    return sorted(
        map(tuple, token_ngram_dup_stats(df, n=N, threshold=THR).collect())
    )


class TestSemantics:
    def test_against_python_model(self, spark):
        assert _got(spark, _docs()) == _py_stats(_docs())

    def test_specific_verdicts(self, spark):
        got = {r[0]: r for r in _got(spark, _docs())}
        assert got[0][3] == 0.0 and not got[0][4]  # first occurrence keeps
        assert got[1][3] == 1.0 and got[1][4]      # identical copy
        assert got[3] == (3, 0, 0, 0.0, False)     # too short to judge
        assert got[4][1] == 1                      # one distinct gram

    def test_partition_invariance(self, spark):
        docs = _docs()
        a = spark.createDataFrame(docs, "doc_id long, tokens array<int>").repartition(1)
        b = spark.createDataFrame(docs, "doc_id long, tokens array<int>").repartition(7)
        assert sorted(map(tuple, token_ngram_dup_stats(a, n=N).collect())) == sorted(
            map(tuple, token_ngram_dup_stats(b, n=N).collect())
        )

    def test_dedup_stage(self, spark):
        docs = _docs()
        df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
        kept = sorted(
            r["doc_id"] for r in token_ngram_dedup(df, n=N, threshold=THR).collect()
        )
        exp = [d for d, _, _, _, dup in _py_stats(docs) if not dup]
        assert kept == exp


class TestPlan:
    def test_no_window(self, spark):
        df = spark.createDataFrame(_docs(), "doc_id long, tokens array<int>")
        plan = (
            token_ngram_dup_stats(df, n=N)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan


class TestDuckDBParity:
    SQL = f"""
        WITH d AS (SELECT doc_id, tokens FROM docs),
        g AS (
          SELECT DISTINCT doc_id,
            md5(array_to_string(tokens[i+1 : i+{N}], ',')) AS gram
          FROM d, unnest(range(0, greatest(len(tokens) - {N} + 1, 0))) AS t(i)
        ),
        keep AS (SELECT gram, MIN(doc_id) AS keeper FROM g GROUP BY 1),
        per AS (
          SELECT g.doc_id, COUNT(*) AS n_grams,
            SUM(CASE WHEN k.keeper < g.doc_id THEN 1 ELSE 0 END) AS n_dup
          FROM g JOIN keep k USING (gram) GROUP BY 1
        )
        SELECT d.doc_id,
          COALESCE(per.n_grams, 0) AS n_grams,
          COALESCE(per.n_dup, 0) AS n_dup_grams,
          CASE WHEN COALESCE(per.n_grams, 0) > 0
               THEN ROUND(per.n_dup * 1.0 / per.n_grams, 6) ELSE 0.0 END AS dup_frac,
          CASE WHEN COALESCE(per.n_grams, 0) > 0
               THEN ROUND(per.n_dup * 1.0 / per.n_grams, 6) >= {THR}
               ELSE FALSE END AS is_dup
        FROM d LEFT JOIN per USING (doc_id) ORDER BY doc_id
    """

    def test_replay(self, spark):
        docs = _docs()
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE docs AS SELECT * FROM (VALUES "
            + ",".join(f"({d}, {list(t)})" for d, t in docs)
            + ") v(doc_id, tokens)"
        )
        oracle = [
            (r[0], r[1], r[2], r[3], bool(r[4]))
            for r in con.execute(self.SQL).fetchall()
        ]
        assert _got(spark, docs) == oracle
