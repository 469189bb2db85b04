"""Fuzzy (MinHash near-duplicate) decontamination
(operators/decontaminate.py): the paraphrase-robust complement of the
exact n-gram overlap stage.

Pinned here: (1) a lightly-reworded eval doc in the training set is
caught (exact overlap may miss it at high n; the near-dup verify
catches it), while clean docs survive, (2) decontaminate_fuzzy removes
exactly the flagged docs, (3) train/eval id COLLISIONS are safe (the
internal 't:'/'e:' key tagging), (4) DuckDB replay of the full
band→candidate→Jaccard→flags chain — the same SQL shape the driver
oracle uses, (5) the eval index side of the candidate join is
broadcast (the train side must never shuffle against the eval set).
"""

import duckdb
import pytest

import pyspark.sql.functions as F

from txtlogparser_spark.operators.decontaminate import (
    decontaminate_fuzzy,
    fuzzy_contamination_flags,
    fuzzy_contamination_pairs,
)

# 12-word sentences; doc 1 is doc 100's wording with ONE word swapped
# (jaccard on 3-shingles ≈ 0.54), doc 2 shares nothing.
_EVAL_TXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
_NEAR_TXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
_CLEAN_TXT = "one two three four five six seven eight nine ten eleven twelve"


@pytest.fixture(scope="module")
def corpora(spark):
    train = spark.createDataFrame(
        [(1, _NEAR_TXT), (2, _CLEAN_TXT)], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(100, _EVAL_TXT)], "doc_id long, text string")
    return train, ev


class TestSemantics:
    def test_near_dup_flagged_clean_survives(self, spark, corpora):
        train, ev = corpora
        flags = {
            r["doc_id"]: r
            for r in fuzzy_contamination_flags(train, ev, threshold=0.5).collect()
        }
        assert flags[1]["is_fuzzy_contaminated"]
        assert flags[1]["matched_eval_id"] == 100
        assert 0.5 <= flags[1]["best_jacc"] < 1.0
        assert not flags[2]["is_fuzzy_contaminated"]
        assert flags[2]["best_jacc"] is None

    def test_decontaminate_removes_flagged(self, spark, corpora):
        train, ev = corpora
        kept = decontaminate_fuzzy(train, ev, threshold=0.5)
        assert [r["doc_id"] for r in kept.collect()] == [2]

    def test_id_collision_safe(self, spark):
        # same doc_id=7 on both sides, different text: the tagged keys
        # must keep them apart (no self-pair, no dropped flag)
        train = spark.createDataFrame(
            [(7, _NEAR_TXT)], "doc_id long, text string"
        )
        ev = spark.createDataFrame([(7, _EVAL_TXT)], "doc_id long, text string")
        pairs = fuzzy_contamination_pairs(train, ev, threshold=0.5).collect()
        assert [(r["train_id"], r["eval_id"]) for r in pairs] == [("7", "7")]

    def test_identical_doc_is_jacc_1(self, spark):
        train = spark.createDataFrame(
            [(1, _EVAL_TXT), (2, _CLEAN_TXT)], "doc_id long, text string"
        )
        ev = spark.createDataFrame([(9, _EVAL_TXT)], "doc_id long, text string")
        pairs = fuzzy_contamination_pairs(train, ev).collect()
        assert len(pairs) == 1 and pairs[0]["jacc"] == 1.0


class TestPlanShape:
    def test_eval_index_is_broadcast(self, spark, corpora):
        train, ev = corpora
        plan = fuzzy_contamination_pairs(train, ev)._jdf.queryExecution(
        ).executedPlan().toString()
        # the band-bucket candidate join must broadcast the (tiny) eval
        # index — a shuffled band join would exchange the train side
        # against the eval set
        assert "BroadcastHashJoin" in plan


class TestDuckDBParity:
    def test_flags_replay(self, spark):
        # documents fixture slice: %10 == 0 plays eval, rest train —
        # the exact split the driver query uses
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        train = docs.where(F.col("doc_id") % 10 != 0)
        ev = docs.where(F.col("doc_id") % 10 == 0)
        got = sorted(
            (
                r["doc_id"],
                r["is_fuzzy_contaminated"],
                r["best_jacc"],
                r["matched_eval_id"],
            )
            for r in fuzzy_contamination_flags(train, ev, threshold=0.5).collect()
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'"
        )
        # same standalone SQL shape as the driver oracle's fuzzy section
        sql = """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                  unnest([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                          for i in range(1, len(words) - 1)]) AS shingle
                FROM w)
            ),
            hashed AS (
              SELECT doc_id, seed,
                MIN(substr(md5(seed || ':' || shingle), 1, 8)) AS mh
              FROM sh, unnest(range(0, 16)) AS t(seed)
              GROUP BY doc_id, seed
            ),
            sig AS (
              SELECT doc_id,
                list_sort(list(printf('%02d', seed) || '=' || mh)) AS sig
              FROM hashed GROUP BY doc_id
            ),
            banded AS (
              SELECT doc_id, b,
                md5(array_to_string(sig[b*4+1 : b*4+4], '|')) AS bkey
              FROM sig, unnest(range(0, 4)) AS t(b)
            ),
            cands AS (
              SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
              FROM banded t JOIN banded e ON t.b = e.b AND t.bkey = e.bkey
              WHERE t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
            ),
            cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            pairs AS (
              SELECT c.train_id, c.eval_id, COUNT(*) AS inter
              FROM cands c
              JOIN sh a ON a.doc_id = c.train_id
              JOIN sh b ON b.doc_id = c.eval_id AND b.shingle = a.shingle
              GROUP BY 1, 2
            ),
            ver AS (
              SELECT p.train_id, p.eval_id,
                ROUND(inter * 1.0 / (ca.n + cb.n - inter), 6) AS jacc
              FROM pairs p
              JOIN cnt ca ON ca.doc_id = p.train_id
              JOIN cnt cb ON cb.doc_id = p.eval_id
              WHERE ROUND(inter * 1.0 / (ca.n + cb.n - inter), 6) >= 0.5
            ),
            hits AS (
              SELECT train_id, MAX(jacc) AS bj, MIN(eval_id) AS me
              FROM ver GROUP BY 1
            )
            SELECT d.doc_id, h.train_id IS NOT NULL, h.bj, h.me
            FROM documents d LEFT JOIN hits h ON h.train_id = d.doc_id
            WHERE d.doc_id % 10 <> 0 ORDER BY d.doc_id
        """
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want
