"""bm25_topk (operators/retrieval.py): independent-model parity,
candidate filtering, determinism of ties, plan shape (map-side scoring,
no corpus-sized shuffle), and edge cases."""

import math

import pytest


DOCS = [
    (0, "spark join merge join"),
    (1, "table scan filter scan scan"),
    (2, "stream window stream"),
    (3, "join table window"),
    (4, "the quick brown fox"),          # matches nothing
    (5, ""),                              # empty doc
    (6, "join join join join join join"),  # tf saturation
]

QUERIES = [
    ("qa", ["join", "merge"]),
    ("qb", ["scan"]),
    ("qc", ["stream", "window"]),
]


def model_bm25(docs, queries, k1=1.2, b=0.75, k=10):
    words = {i: [w for w in t.lower().split() if w] for i, t in docs}
    n = len(docs)
    avgdl = sum(len(ws) for ws in words.values()) / n
    terms = sorted({t for _, ts in queries for t in ts})
    df = {
        t: sum(1 for ws in words.values() if t in ws) for t in terms
    }
    idf = {
        t: math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in terms
    }
    out = []
    for qid, ts in queries:
        scored = []
        for i, ws in words.items():
            s = 0.0
            for t in ts:
                tf = ws.count(t)
                s = s + idf[t] * (
                    tf * (k1 + 1.0)
                    / (tf + k1 * ((1.0 - b) + b * (len(ws) / avgdl)))
                )
            if s > 0.0:
                scored.append((i, s))
        scored.sort(key=lambda p: (-p[1], p[0]))
        for r, (i, s) in enumerate(scored[:k], 1):
            out.append((qid, r, i, round(s, 6)))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


class TestBm25:
    def test_matches_model(self, spark, docs):
        from txtlogparser_spark.operators.retrieval import bm25_topk

        got = [
            (r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in bm25_topk(docs, QUERIES)
            .orderBy("query_id", "rank")
            .collect()
        ]
        assert got == model_bm25(DOCS, QUERIES)

    def test_zero_score_docs_never_ranked(self, spark, docs):
        from txtlogparser_spark.operators.retrieval import bm25_topk

        got = bm25_topk(docs, QUERIES).collect()
        assert all(r["score"] > 0 for r in got)
        assert not any(r["doc_id"] in (4, 5) for r in got)

    def test_k_truncates(self, spark, docs):
        from txtlogparser_spark.operators.retrieval import bm25_topk

        got = bm25_topk(docs, [("q", ["join"])], k=2).collect()
        assert len(got) == 2 and [r["rank"] for r in got] == [1, 2]

    def test_rare_term_outranks_common(self, spark, docs):
        """idf must dominate: a doc matching only the rarer term of a
        two-term query outranks equal-tf matches of the common term."""
        from txtlogparser_spark.operators.retrieval import bm25_topk

        # 'merge' appears in 1 doc, 'join' in 3 — doc 0 has both
        got = bm25_topk(docs, [("q", ["merge", "join"])]).collect()
        assert got[0]["doc_id"] == 0

    def test_candidate_filter_is_map_side(self, spark, docs):
        """The score>0 filter must sit BELOW the rank window's exchange:
        the shuffle moves posting-union candidates, never the corpus."""
        from txtlogparser_spark.operators.retrieval import bm25_topk

        plan = (
            bm25_topk(docs, QUERIES)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        exch = plan.find("Exchange")
        assert exch != -1
        assert "Filter" in plan[exch:], (
            "candidate filter not below the exchange"
        )
        assert "Exchange SinglePartition" not in plan

    def test_one_scan_for_all_queries(self, spark, docs):
        """stack() fans every query out of ONE corpus projection — the
        scoring plan must contain exactly one scan of the input."""
        from txtlogparser_spark.operators.retrieval import bm25_topk

        plan = (
            bm25_topk(docs, QUERIES)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Scan ExistingRDD") <= 1

    def test_validations_and_empty(self, spark, docs):
        from txtlogparser_spark.operators.retrieval import bm25_topk

        with pytest.raises(ValueError):
            bm25_topk(docs, [])
        with pytest.raises(ValueError):
            bm25_topk(docs, [("q", [])])
        with pytest.raises(ValueError):
            bm25_topk(docs, QUERIES, k=0)
        empty = spark.createDataFrame([], "doc_id long, text string")
        assert bm25_topk(empty, QUERIES).collect() == []


def test_empty_corpus_keeps_id_type(spark):
    """The empty-corpus early return must carry id_col's ACTUAL type so
    both paths union cleanly."""
    from txtlogparser_spark.operators.retrieval import bm25_topk

    empty = spark.createDataFrame([], "doc_id string, text string")
    out = bm25_topk(empty, QUERIES)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    assert out.collect() == []
