"""paragraph_dedup (operators/dedup.py): corpus-wide exact paragraph
dedup with first-occurrence keepers — the CCNet/RefinedWeb
boilerplate-removal stage.

Verification surfaces:
- DuckDB value parity (same role as the driver oracles; the registry's
  50-slot window is full, so this operator's oracle lives here),
- an independent pure-Python model,
- the physical-plan shape claim: keeper election must be a partial
  (map-side combine) aggregation, never a per-digest window — a
  boilerplate paragraph with millions of copies would funnel through
  one task under a window.
"""

import duckdb
import pytest

import pyspark.sql.functions as F

from txtlogparser_spark.operators.dedup import paragraph_dedup

DOCS = [
    # boilerplate "SUBSCRIBE NOW" appears in three docs (and twice in
    # one of them) — only doc 1 pos 1 survives
    (1, "intro one\n\nSUBSCRIBE NOW\n\nbody one"),
    (2, "SUBSCRIBE NOW\n\nbody two\n\nSUBSCRIBE NOW"),
    (3, "body three\n\nSUBSCRIBE NOW\n\nintro one"),
    # a document that is pure boilerplate reassembles to ''
    (4, "SUBSCRIBE NOW"),
    # empty text = one empty paragraph; it dedups corpus-wide too
    (5, ""),
    (6, ""),
    # NULL text counts as '' — the doc must still get its output row
    (7, None),
]


def _python_model(docs, sep="\n\n"):
    docs = [(d, t if t is not None else "") for d, t in docs]  # NULL == ''
    seen = {}
    for doc_id, text in sorted(docs):
        for pos, para in enumerate(text.split(sep)):
            seen.setdefault(para, (doc_id, pos))
    out = {}
    for doc_id, text in docs:
        kept = [
            p
            for pos, p in enumerate(text.split(sep))
            if seen[p] == (doc_id, pos)
        ]
        total = len(text.split(sep))
        out[doc_id] = (sep.join(kept), len(kept), total - len(kept))
    return out


class TestParagraphDedup:
    def _run(self, spark, docs=DOCS):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        return {
            r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
            for r in paragraph_dedup(df).collect()
        }

    def test_matches_python_model(self, spark):
        assert self._run(spark) == _python_model(DOCS)

    def test_duckdb_parity(self, spark):
        got = self._run(spark)
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
        rows = con.execute(
            """
            WITH p AS (
              SELECT doc_id, idx - 1 AS pos, parts[idx] AS para
              FROM (SELECT doc_id,
                           string_split(COALESCE(text, ''), chr(10) || chr(10)) AS parts
                    FROM docs),
                   unnest(range(1, len(parts) + 1)) AS t(idx)
            ),
            kept AS (
              SELECT doc_id, pos, para FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
                FROM p) WHERE rn = 1
            ),
            rebuilt AS (
              SELECT doc_id,
                string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean_text,
                COUNT(*) AS n_kept
              FROM kept GROUP BY doc_id
            )
            SELECT t.doc_id,
              COALESCE(r.clean_text, '') AS clean_text,
              COALESCE(r.n_kept, 0) AS n_kept,
              t.n - COALESCE(r.n_kept, 0) AS n_dropped
            FROM (SELECT doc_id, COUNT(*) AS n FROM p GROUP BY doc_id) t
            LEFT JOIN rebuilt r USING (doc_id)
            """
        ).fetchall()
        want = {r[0]: (r[1], int(r[2]), int(r[3])) for r in rows}
        assert got == want

    def test_semantics_pinned(self, spark):
        got = self._run(spark)
        # first occurrence = doc 1 pos 1 keeps the boilerplate
        assert got[1] == ("intro one\n\nSUBSCRIBE NOW\n\nbody one", 3, 0)
        # later copies dropped, including the intra-doc repeat in doc 2
        assert got[2] == ("body two", 1, 2)
        # "intro one" already seen in doc 1 pos 0
        assert got[3] == ("body three", 1, 2)
        # fully-boilerplate doc survives as an empty row
        assert got[4] == ("", 0, 1)
        # empty paragraph dedups corpus-wide like any other
        assert got[5] == ("", 1, 0)
        assert got[6] == ("", 0, 1)
        # NULL text: doc keeps its output row (counted as '')
        assert got[7] == ("", 0, 1)

    def test_keep_empty_docs_false_drops_hollow_docs(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        ids = {
            r["doc_id"]
            for r in paragraph_dedup(df, keep_empty_docs=False).collect()
        }
        assert ids == {1, 2, 3, 5}

    def test_plan_keeper_election_is_partial_agg(self, spark):
        """The digest keeper election must compile to a hash aggregate
        with a map-side partial (two HashAggregate levels around the
        exchange), NOT a window — the skew-proofness claim."""
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        plan = (
            paragraph_dedup(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert plan.count("HashAggregate") >= 2

    def test_custom_separator(self, spark):
        docs = [(1, "a|b|a"), (2, "b|c")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
            for r in paragraph_dedup(df, sep="|").collect()
        }
        assert got == {1: ("a|b", 2, 1), 2: ("c", 1, 1)}

    def test_regex_metachar_separator_is_literal(self, spark):
        docs = [(1, "a.b.a"), (2, "xyz")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: r["clean_text"]
            for r in paragraph_dedup(df, sep=".").collect()
        }
        # '.' splits literally, not as regex-any-char
        assert got == {1: "a.b", 2: "xyz"}
