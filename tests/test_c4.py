"""C4-style line-level cleaning (operators/c4.py): the Raffel et al.
2020 web-text cleaning rules as pure Catalyst higher-order functions.

Pinned here: (1) each line rule (terminal punctuation, min words,
javascript, policy boilerplate) and each page rule (curly brace,
lorem ipsum, min surviving lines) in isolation, (2) agreement with an
independent pure-Python model over a generated page corpus, (3)
bit-exact DuckDB replay of counts, verdicts AND the cleaned text, (4)
the plan is map-only — no Exchange touches the fact table, (5)
c4_clean's pass-through/replace contract.
"""

import re

import duckdb

from txtlogparser_spark.operators.c4 import c4_clean, c4_line_stats

MIN_WORDS = 5
MIN_LINES = 3
_POLICY = ("terms of use", "privacy policy", "cookie policy", "uses cookies")


def _py_keep_line(line: str) -> bool:
    low = line.lower()
    return (
        bool(re.search(r'[.!?"]$', line))
        and len([w for w in line.strip().split(" ") if w]) >= MIN_WORDS
        and "javascript" not in low
        and not any(p in low for p in _POLICY)
    )


def _py_stats(doc_id, text):
    lines = text.split("\n")
    kept = [l for l in lines if _py_keep_line(l)]
    flagged = "{" in text or "lorem ipsum" in text.lower()
    page_kept = not flagged and len(kept) >= MIN_LINES
    return (
        doc_id,
        len(lines),
        len(kept),
        flagged,
        page_kept,
        "\n".join(kept) if page_kept else "",
    )


def _pages():
    """Deterministic corpus exercising every rule and their overlaps."""
    good = "the quick brown fox jumps over the dog."
    pages = []
    # clean page: all lines survive
    pages.append((0, "\n".join([good] * 4)))
    # no terminal punct on some lines
    pages.append((1, "\n".join([good, good[:-1], good, "no punct here at all", good])))
    # short lines dropped; page dies when < MIN_LINES survive
    pages.append((2, "\n".join([good, "too short.", "tiny.", "also quite short."])))
    # javascript + policy boilerplate lines dropped
    pages.append(
        (
            3,
            "\n".join(
                [
                    good,
                    "please enable JavaScript to view this site.",
                    "this site uses cookies to improve your experience.",
                    "read our Privacy Policy and terms of use today.",
                    good,
                    good,
                ]
            ),
        )
    )
    # page-level kills, even with plenty of good lines
    pages.append((4, "\n".join([good] * 5) + "\nvar x = { a: 1 };"))
    pages.append((5, "\n".join([good] * 5) + "\nLorem Ipsum dolor sit amet."))
    # empty-ish page
    pages.append((6, "word"))
    # trailing/extra whitespace words collapse in the word count
    pages.append((7, "\n".join(["a  b   c d e f." , good, good, good])))
    return pages


def _got(spark, pages):
    df = spark.createDataFrame(pages, "doc_id long, text string")
    return sorted(
        map(
            tuple,
            c4_line_stats(
                df, min_words_per_line=MIN_WORDS, min_lines=MIN_LINES
            ).collect(),
        )
    )


class TestSemantics:
    def test_against_python_model(self, spark):
        pages = _pages()
        assert _got(spark, pages) == sorted(_py_stats(d, t) for d, t in pages)

    def test_rule_coverage(self, spark):
        got = {r[0]: r for r in _got(spark, _pages())}
        assert got[0][4] is True and got[0][2] == 4
        assert got[1][2] == 3  # two bad-punct lines dropped
        assert got[2][4] is False  # only 1 survivor < MIN_LINES
        assert got[3][2] == 3  # js + 2 policy lines dropped
        assert got[4][3] is True and got[4][4] is False  # '{'
        assert got[5][3] is True and got[5][4] is False  # lorem ipsum
        assert got[6] == (6, 1, 0, False, False, "")

    def test_clean_replaces_text_keeps_columns(self, spark):
        df = spark.createDataFrame(
            [(d, t, f"src{d % 2}") for d, t in _pages()],
            "doc_id long, text string, source string",
        )
        out = c4_clean(df, min_words_per_line=MIN_WORDS, min_lines=MIN_LINES)
        rows = {r["doc_id"]: r for r in out.collect()}
        model = {d: _py_stats(d, t) for d, t in _pages()}
        assert set(rows) == {d for d, m in model.items() if m[4]}
        for d, r in rows.items():
            assert r["text"] == model[d][5]
            assert r["source"] == f"src{d % 2}"


class TestPlan:
    def test_map_only(self, spark):
        df = spark.createDataFrame(_pages(), "doc_id long, text string")
        plan = c4_line_stats(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_clean_map_only(self, spark):
        # the pipeline stage must be a projection + filter, never a
        # corpus self-join on the doc key (an earlier draft's shape)
        df = spark.createDataFrame(_pages(), "doc_id long, text string")
        plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan


class TestDuckDBParity:
    SQL = f"""
        WITH s AS (
          SELECT doc_id, string_split(text, chr(10)) AS lines,
            list_filter(string_split(text, chr(10)), l ->
              regexp_matches(l, '[.!?"]$')
              AND len(list_filter(string_split(trim(l), ' '), w -> w != '')) >= {MIN_WORDS}
              AND NOT contains(lower(l), 'javascript')
              AND NOT regexp_matches(lower(l),
                  'terms of use|privacy policy|cookie policy|uses cookies')
            ) AS kept,
            (contains(text, '{{') OR contains(lower(text), 'lorem ipsum'))
              AS page_flagged
          FROM pages
        )
        SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
          page_flagged,
          (NOT page_flagged AND len(kept) >= {MIN_LINES}) AS page_kept,
          CASE WHEN NOT page_flagged AND len(kept) >= {MIN_LINES}
               THEN array_to_string(kept, chr(10)) ELSE '' END AS cleaned_text
        FROM s ORDER BY doc_id
    """

    def test_replay(self, spark):
        pages = _pages()
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pages AS SELECT * FROM (VALUES "
            + ",".join(
                "(%d, '%s')" % (d, t.replace("'", "''").replace("\n", "' || chr(10) || '"))
                for d, t in pages
            )
            + ") t(doc_id, text)"
        )
        oracle = [
            (r[0], r[1], r[2], bool(r[3]), bool(r[4]), r[5])
            for r in con.execute(self.SQL).fetchall()
        ]
        assert _got(spark, pages) == oracle
