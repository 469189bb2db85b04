"""Exact substring-level dedup (operators/dedup.py::
duplicated_span_table / strip_duplicated_spans) — the ExactSubstr
recipe of Lee et al. 2021 over rolling k-word grams: any k-gram
occurring >1 time in the corpus is duplicated text; all but its first
occurrence are removed, with overlapping marks merged into maximal
word spans.

Verification surfaces (the driver registry's 50-slot window is full,
so this operator's value oracle lives here, like paragraph_dedup's):
- DuckDB full-SQL replay (k-gram hash -> keeper election -> interval
  merge -> word filter),
- an independent pure-Python model,
- pinned fixture semantics (cross-doc dup, intra-doc repeat, overlap
  merging, keeper survival, short-doc exemption),
- the physical-plan shape claim: gram keeper election must be a
  partial (map-side combine) aggregation — a boilerplate gram with
  millions of copies must never funnel through one task's window.
"""

import duckdb
import pytest

from txtlogparser_spark.operators.dedup import (
    duplicated_span_table,
    kgram_occurrences,
    strip_duplicated_spans,
)

K = 4

# Crafted so every interesting case appears at k=4:
# - docs 1 and 2 share the 6-word run "the quick brown fox jumps high"
#   (3 overlapping duplicated 4-grams in doc 2 -> ONE merged span of 6
#   words; doc 1 holds every keeper, so doc 1 loses nothing)
# - doc 3 repeats its own opening 4 words at its tail (intra-doc dup)
# - doc 4 is 3 words long: shorter than k, exempt by construction
# - doc 5 is empty, doc 6 NULL: must still produce output rows
DOCS = [
    (1, "the quick brown fox jumps high over the lazy dog today"),
    (2, "intro words then the quick brown fox jumps high and more tail"),
    (3, "alpha beta gamma delta filler one two alpha beta gamma delta"),
    (4, "too short here"),
    (5, ""),
    (6, None),
]


def _python_model(docs, k=K):
    """Independent model: first-occurrence keepers by (id, pos), merged
    half-open [pos, pos+k) spans over non-keeper duplicated grams."""
    docs = [(d, t or "") for d, t in docs]
    occ = []  # (gram, id, pos)
    for doc_id, text in docs:
        w = text.split(" ")
        for pos in range(len(w) - k + 1):
            occ.append((" ".join(w[pos : pos + k]), doc_id, pos))
    from collections import Counter, defaultdict

    counts = Counter(g for g, _, _ in occ)
    keeper = {}
    for g, d, p in sorted(occ, key=lambda t: (t[1], t[2])):
        keeper.setdefault(g, (d, p))
    marks = defaultdict(list)
    for g, d, p in occ:
        if counts[g] > 1 and keeper[g] != (d, p):
            marks[d].append(p)
    spans = defaultdict(list)
    for d, ps in marks.items():
        ps.sort()
        cur = None
        for p in ps:
            if cur and p <= cur[1]:
                cur[1] = max(cur[1], p + k)
                cur[2] += 1
            else:
                if cur:
                    spans[d].append(tuple(cur))
                cur = [p, p + k, 1]
        spans[d].append(tuple(cur))
    cleaned = {}
    for doc_id, text in docs:
        w = text.split(" ")
        kept = [
            x
            for i, x in enumerate(w)
            if not any(s <= i < e for s, e, _ in spans.get(doc_id, []))
        ]
        cleaned[doc_id] = (" ".join(kept), len(w), len(w) - len(kept))
    return dict(spans), cleaned


class TestSubstringDedup:
    def _spans(self, spark, docs=DOCS, k=K):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {}
        for r in duplicated_span_table(df, k=k).collect():
            out.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"], r["n_grams"])
            )
        return {d: sorted(v) for d, v in out.items()}

    def _clean(self, spark, docs=DOCS, k=K):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        return {
            r["doc_id"]: (r["clean_text"], r["n_words"], r["n_words_removed"])
            for r in strip_duplicated_spans(df, k=k).collect()
        }

    def test_spans_match_python_model(self, spark):
        want_spans, _ = _python_model(DOCS)
        assert self._spans(spark) == {d: sorted(v) for d, v in want_spans.items()}

    def test_strip_matches_python_model(self, spark):
        _, want_clean = _python_model(DOCS)
        assert self._clean(spark) == want_clean

    def test_semantics_pinned(self, spark):
        spans = self._spans(spark)
        # doc 1 holds every keeper (smallest (id,pos)): loses nothing
        assert 1 not in spans
        # doc 2: grams at word 3,4,5 ("the quick brown fox" ...) merge
        # into ONE span covering words [3, 9) — 3 grams, 6 words
        assert spans[2] == [(3, 9, 3)]
        # doc 3 intra-doc repeat: tail copy of "alpha beta gamma delta"
        # at word 7 is removed, opening copy at 0 kept
        assert spans[3] == [(7, 11, 1)]
        # shorter-than-k / empty / NULL docs produce no spans
        assert set(spans) == {2, 3}
        clean = self._clean(spark)
        assert clean[1] == (DOCS[0][1], 11, 0)
        assert clean[2] == ("intro words then and more tail", 12, 6)
        assert clean[3] == ("alpha beta gamma delta filler one two", 11, 4)
        assert clean[4] == ("too short here", 3, 0)
        # empty text splits to one '' word; NULL coalesces to the same
        assert clean[5] == ("", 1, 0)
        assert clean[6] == ("", 1, 0)

    def test_duckdb_parity(self, spark):
        got_spans = self._spans(spark)
        got_clean = self._clean(spark)
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
        rows = con.execute(
            f"""
            WITH w AS (
              SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws
              FROM docs
            ),
            g AS (
              SELECT doc_id, i - 1 AS pos,
                     md5(array_to_string(ws[i : i + {K} - 1], ' ')) AS gh
              FROM w, unnest(range(1, len(ws) - {K} + 2)) AS t(i)
              WHERE len(ws) >= {K}
            ),
            occ AS (
              SELECT doc_id, pos FROM (
                SELECT doc_id, pos,
                  row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos)
                    AS rn
                FROM g
              ) WHERE rn >= 2
            ),
            m AS (
              SELECT doc_id, pos, pos + {K} AS e,
                MAX(pos + {K}) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
              FROM occ
            ),
            grp AS (
              SELECT *, SUM(CASE WHEN pmax IS NULL OR pos > pmax
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
              FROM m
            )
            SELECT doc_id, MIN(pos) AS span_start, MAX(e) AS span_end,
                   COUNT(*) AS n_grams
            FROM grp GROUP BY doc_id, s
            """
        ).fetchall()
        want_spans = {}
        for d, s, e, n in rows:
            want_spans.setdefault(d, []).append((int(s), int(e), int(n)))
        assert got_spans == {d: sorted(v) for d, v in want_spans.items()}
        # removal half: per-word anti-coverage filter replayed in SQL
        clean_rows = con.execute(
            f"""
            WITH w AS (
              SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws
              FROM docs
            ),
            g AS (
              SELECT doc_id, i - 1 AS pos,
                     md5(array_to_string(ws[i : i + {K} - 1], ' ')) AS gh
              FROM w, unnest(range(1, len(ws) - {K} + 2)) AS t(i)
              WHERE len(ws) >= {K}
            ),
            occ AS (
              SELECT doc_id, pos FROM (
                SELECT doc_id, pos,
                  row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos)
                    AS rn
                FROM g
              ) WHERE rn >= 2
            ),
            wordpos AS (
              SELECT doc_id, i - 1 AS wi, ws[i] AS word
              FROM w, unnest(range(1, len(ws) + 1)) AS t(i)
            ),
            kept AS (
              SELECT wp.doc_id, wp.wi, wp.word
              FROM wordpos wp
              WHERE NOT EXISTS (
                SELECT 1 FROM occ o
                WHERE o.doc_id = wp.doc_id
                  AND wp.wi >= o.pos AND wp.wi < o.pos + {K}
              )
            )
            SELECT d.doc_id,
              COALESCE(string_agg(k.word, ' ' ORDER BY k.wi), '')
                AS clean_text,
              (SELECT COUNT(*) FROM wordpos x WHERE x.doc_id = d.doc_id)
                AS n_words,
              (SELECT COUNT(*) FROM wordpos x WHERE x.doc_id = d.doc_id)
                - COUNT(k.wi) AS n_words_removed
            FROM docs d LEFT JOIN kept k ON d.doc_id = k.doc_id
            GROUP BY d.doc_id
            """
        ).fetchall()
        want_clean = {r[0]: (r[1], int(r[2]), int(r[3])) for r in clean_rows}
        assert got_clean == want_clean

    def test_precomputed_spans_reused(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        spans = duplicated_span_table(df, k=K)
        direct = self._clean(spark)
        via_spans = {
            r["doc_id"]: (r["clean_text"], r["n_words"], r["n_words_removed"])
            for r in strip_duplicated_spans(df, k=K, spans=spans).collect()
        }
        assert via_spans == direct

    def test_plan_keeper_election_is_partial_agg(self, spark):
        """The gram keeper election (count + min-struct per gram hash)
        must compile to hash aggregates with a map-side partial; the
        ONLY Window in the whole span plan is the per-document interval
        merge — never a per-gram-hash window (skew-proofness)."""
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        plan = (
            duplicated_span_table(df, k=K)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("HashAggregate") >= 2
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "_gh" not in line

    def test_k_validation(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        with pytest.raises(ValueError):
            kgram_occurrences(df, k=0)
