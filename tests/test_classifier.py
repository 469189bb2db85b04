"""Hashed linear quality-classifier scoring (functions/classifier.py):
the GPT-3/CCNet quality-classifier stage with real plumbing and a
deterministic stand-in model.

Pinned here: (1) score agreement with an independent Python model of
the hashed-feature linear scorer, (2) empty/whitespace text scores
sigmoid(bias), (3) the keep-verdict contract, (4) partition
invariance, (5) DuckDB replay of the exact-integer weight sum and the
sigmoid (approx to 1e-12: exp is the one libm op), (6) map-only plan.
"""

import hashlib
import math

import duckdb
import pytest

from txtlogparser_spark.functions.classifier import (
    classifier_quality,
    classifier_quality_table,
    classifier_score,
)

SALT = "qcls-v1"


def _py_score(text, bias=0.0):
    words = [w for w in text.split() if w]
    total = sum(
        int(hashlib.md5(f"{SALT}:{w}".encode()).hexdigest()[:6], 16) % 2001
        - 1000
        for w in words
    )
    z = (total / (1000.0 * len(words)) if words else 0.0) + bias
    return 1.0 / (1.0 + math.exp(-z))


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spam spam spam buy now cheap"),
    (2, ""),
    (3, "   "),
    (4, "one"),
    (5, "a b c d e f g h i j k l m n o p"),
    (6, "tabs\tand\nnewlines split too"),
]


def _got(spark, bias=0.0):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: (r["clf_score"], r["clf_score_keep"])
        for r in classifier_quality(df, bias=bias).collect()
    }


class TestScore:
    def test_against_python_model(self, spark):
        got = _got(spark)
        for d, t in DOCS:
            assert got[d][0] == pytest.approx(_py_score(t), abs=1e-12)

    def test_empty_scores_sigmoid_bias(self, spark):
        got = _got(spark, bias=1.5)
        expected = 1.0 / (1.0 + math.exp(-1.5))
        assert got[2][0] == pytest.approx(expected, abs=1e-12)
        assert got[3][0] == pytest.approx(expected, abs=1e-12)

    def test_keep_verdict(self, spark):
        got = _got(spark)
        for d, t in DOCS:
            assert got[d][1] == (_py_score(t) >= 0.5)

    def test_partition_invariance(self, spark):
        rows = [(i, f"word{i % 13} tail{i} filler common") for i in range(300)]
        a = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
        b = spark.createDataFrame(rows, "doc_id long, text string").repartition(11)
        sa = sorted((r["doc_id"], r["clf_score"]) for r in classifier_quality(a).collect())
        sb = sorted((r["doc_id"], r["clf_score"]) for r in classifier_quality(b).collect())
        assert sa == sb


def _hash_weight_q(word):
    return int(hashlib.md5(f"{SALT}:{word}".encode()).hexdigest()[:6], 16) % 2001 - 1000


class TestWeightTable:
    """classifier_quality_table — the trained-model deployment path.
    The swap-in guarantee: feeding it the hash_weight table over the
    corpus vocabulary reproduces the map-only stand-in bit-for-bit;
    out-of-vocabulary words score 0."""

    def _weights(self, spark, vocab):
        return spark.createDataFrame(
            [(w, _hash_weight_q(w)) for w in sorted(vocab)],
            "word string, weight_q long",
        )

    def test_matches_hashed_path(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        vocab = {w for _, t in DOCS for w in t.split() if w}
        got = {
            r["doc_id"]: (r["clf_score"], r["clf_score_keep"])
            for r in classifier_quality_table(df, self._weights(spark, vocab)).collect()
        }
        assert got == _got(spark)

    def test_oov_scores_zero_weight(self, spark):
        df = spark.createDataFrame([(0, "alpha beta gamma")], "doc_id long, text string")
        wt = self._weights(spark, {"alpha"})  # beta/gamma out-of-vocab
        (row,) = classifier_quality_table(df, wt).collect()
        z = _hash_weight_q("alpha") / (1000.0 * 3)
        assert row["clf_score"] == pytest.approx(1.0 / (1.0 + math.exp(-z)), abs=1e-12)

    def test_broadcast_plan(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        vocab = {w for _, t in DOCS for w in t.split() if w}
        plan = (
            classifier_quality_table(df, self._weights(spark, vocab))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        # the one exchange a table scorer needs: the regroup to doc key;
        # the weight table never shuffles and there is no corpus rejoin
        assert "SortMergeJoin" not in plan
        assert plan.count("Exchange hashpartitioning") == 1


class TestPlan:
    def test_map_only(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        plan = (
            classifier_quality(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestDuckDBParity:
    SQL = f"""
        WITH w AS (
          SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')
              AS words
          FROM docs
        ),
        s AS (
          SELECT doc_id, len(words) AS n,
            list_sum(list_transform(words, x ->
              CAST(('0x' || substr(md5('{SALT}:' || x), 1, 6)) AS BIGINT)
                % 2001 - 1000)) AS total
          FROM w
        )
        SELECT doc_id,
          1.0 / (1.0 + exp(-(CASE WHEN n > 0
                                  THEN total / (1000.0 * n)
                                  ELSE 0.0 END))) AS clf_score
        FROM s ORDER BY doc_id
    """

    def test_replay(self, spark):
        got = _got(spark)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE docs AS SELECT * FROM (VALUES "
            + ",".join(
                "(%d, '%s')" % (d, t.replace("'", "''").replace("\n", "' || chr(10) || '").replace("\t", "' || chr(9) || '"))
                for d, t in DOCS
            )
            + ") t(doc_id, text)"
        )
        for doc_id, score in con.execute(self.SQL).fetchall():
            score = score if score is not None else 0.5
            assert got[doc_id][0] == pytest.approx(score, abs=1e-12)
