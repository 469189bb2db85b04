"""bigram_lm_train / lm_score (operators/lm.py) vs an independent
Python model and a DuckDB SQL replay (pytest-oracled; the driver
registry's 50-slot window is full)."""

import math

import duckdb
import pytest

from txtlogparser_spark.operators.lm import BOS, bigram_lm_train, lm_score

REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog"),
]
SCORE_DOCS = [
    (10, "the cat sat on the rug"),   # in-domain -> low ppl
    (11, "zqx vbn qwerty zzz"),       # junk -> high ppl
    (12, "THE CAT"),                  # lowercase path
    (13, ""),                         # empty -> absent from output
    (14, "single"),                   # one word -> one (BOS, w) bigram
]


def _py_model(ref_docs):
    big, ctx, vocab = {}, {}, set()
    for _, text in ref_docs:
        ws = [w for w in text.lower().split() if w]
        for i, w in enumerate(ws):
            prev = BOS if i == 0 else ws[i - 1]
            big[(prev, w)] = big.get((prev, w), 0) + 1
            ctx[prev] = ctx.get(prev, 0) + 1
            vocab.add(w)
    return big, ctx, len(vocab) + 1


def _py_score(docs, big, ctx, V, k=1.0):
    out = {}
    for doc_id, text in docs:
        ws = [w for w in text.lower().split() if w]
        if not ws:
            continue
        lps = []
        for i, w in enumerate(ws):
            prev = BOS if i == 0 else ws[i - 1]
            c = big.get((prev, w), 0)
            n = ctx.get(prev, 0)
            lps.append(math.log2((c + k) / (n + k * V)))
        avg = round(sum(lps) / len(lps), 6)
        out[doc_id] = (len(lps), avg, round(2.0 ** (-avg), 6))
    return out


class TestBigramLm:
    def _spark_result(self, spark):
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        docs = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
        big, ctx, V = bigram_lm_train(ref)
        out = lm_score(docs, big, ctx, V)
        return V, {
            r["doc_id"]: (r["n_bigrams"], r["avg_log2p"], r["ppl"])
            for r in out.collect()
        }

    def test_train_counts_match_model(self, spark):
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        big, ctx, V = bigram_lm_train(ref)
        pbig, pctx, pV = _py_model(REF)
        assert V == pV
        assert {
            (r["prev"], r["word"]): r["c"] for r in big.collect()
        } == pbig
        assert {r["prev"]: r["n"] for r in ctx.collect()} == pctx

    def test_scores_match_python_model(self, spark):
        V, got = self._spark_result(spark)
        pbig, pctx, pV = _py_model(REF)
        want = _py_score(SCORE_DOCS, pbig, pctx, pV)
        assert got == want

    def test_domain_separation_and_edges(self, spark):
        _, got = self._spark_result(spark)
        # in-domain text scores strictly lower perplexity than junk
        assert got[10][2] < got[11][2]
        # lowercase path: "THE CAT" scores like "the cat"
        assert got[12][0] == 2
        # empty doc absent; single word yields one BOS bigram
        assert 13 not in got
        assert got[14][0] == 1

    def test_duckdb_parity(self, spark):
        V, got = self._spark_result(spark)
        con = duckdb.connect()
        con.execute("CREATE TABLE ref (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO ref VALUES (?, ?)", REF)
        con.execute("CREATE TABLE score_docs (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO score_docs VALUES (?, ?)", SCORE_DOCS)
        rows = con.execute(
            f"""
            WITH rw AS (
              SELECT list_filter(string_split(lower(text), ' '), w -> w != '') AS ws
              FROM ref
            ),
            rb AS (
              SELECT CASE WHEN i = 1 THEN '{BOS}' ELSE ws[i - 1] END AS prev,
                     ws[i] AS word
              FROM rw, unnest(range(1, len(ws) + 1)) AS t(i)
            ),
            big AS (SELECT prev, word, COUNT(*) AS c FROM rb GROUP BY prev, word),
            ctx AS (SELECT prev, COUNT(*) AS n FROM rb GROUP BY prev),
            V AS (SELECT COUNT(DISTINCT word) + 1 AS v FROM rb),
            dw AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), w -> w != '') AS ws
              FROM score_docs
            ),
            db AS (
              SELECT doc_id,
                     CASE WHEN i = 1 THEN '{BOS}' ELSE ws[i - 1] END AS prev,
                     ws[i] AS word
              FROM dw, unnest(range(1, len(ws) + 1)) AS t(i)
            ),
            lp AS (
              SELECT doc_id,
                log2((COALESCE(big.c, 0) + 1.0)
                     / (COALESCE(ctx.n, 0) + 1.0 * (SELECT v FROM V))) AS lp
              FROM db LEFT JOIN big USING (prev, word)
                      LEFT JOIN ctx USING (prev)
            )
            SELECT doc_id, COUNT(*) AS n_bigrams,
              ROUND(AVG(lp), 6) AS avg_log2p,
              ROUND(POW(2.0, -ROUND(AVG(lp), 6)), 6) AS ppl
            FROM lp GROUP BY doc_id
            """
        ).fetchall()
        want = {r[0]: (int(r[1]), float(r[2]), float(r[3])) for r in rows}
        assert got == want

    def test_validation(self, spark):
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        docs = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
        big, ctx, V = bigram_lm_train(ref)
        with pytest.raises(ValueError):
            lm_score(docs, big, ctx, 0)
        with pytest.raises(ValueError):
            lm_score(docs, big, ctx, V, k=0)
