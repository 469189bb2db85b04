"""Property tests for the grok compiler (functions/grok.py): any
composition of library patterns and literal glue must compile to a
valid regex whose capture-group count and order equal the declared
fields, and Python re / DuckDB RE2 must agree on match + extractions
(the library is RE2-safe by construction — this is the test of that
claim over the whole pattern space, not just the handwritten cases).

No Spark needed: the Spark side is one regexp_extract call on the
same regex string, already pinned in test_grok.py; what needs the
property sweep is the COMPILER and the cross-engine regex dialect.
"""

import re

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from txtlogparser_spark.functions.grok import (
    GROK_PATTERNS,
    grok_compile,
)

NAMES = sorted(GROK_PATTERNS)

# literal glue: regex-safe characters (escaped where needed is the
# user's job per grok convention, so generate only safe literals)
_glue = st.text(
    alphabet=" -_:=/,;#@!",
    min_size=0,
    max_size=4,
)

_token = st.builds(
    lambda name, field, typed: (name, field, typed),
    st.sampled_from(NAMES),
    st.one_of(st.none(), st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)),
    st.booleans(),
)


def _render(tokens_and_glue):
    parts = []
    fields = []
    for glue, (name, field, typed) in tokens_and_glue:
        parts.append(glue)
        if field is not None and field not in fields:
            suffix = ":int" if (typed and name in ("INT", "POSINT")) else ""
            parts.append("%{" + name + ":" + field + suffix + "}")
            fields.append(field)
        else:
            parts.append("%{" + name + "}")
    return "".join(parts), fields


# sample inputs that exercise most library patterns
SAMPLE_LINES = [
    '10.1.2.3 - bob [2026-08-18T06:00:01Z] "GET /x/y" 200 77',
    "ERROR 2026-08-18 10:00:00 worker-3 failed after +12.5 retries",
    "d41d8cd9-8a00-4b1e-9e1b-000000000001 host.example.com: done",
    "plain words only",
    "",
]


class TestGrokCompileProperties:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(_glue, _token), min_size=1, max_size=5))
    def test_compiles_with_exact_group_count(self, toks):
        pattern, fields = _render(toks)
        g = grok_compile(pattern)
        assert [f for f, _ in g.fields] == fields
        compiled = re.compile(g.regex)
        # declared fields == capturing groups, in order
        assert compiled.groups == len(fields)

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(st.tuples(_glue, _token), min_size=1, max_size=4),
        st.sampled_from(SAMPLE_LINES),
    )
    def test_python_and_duckdb_agree(self, toks, line):
        """Match/no-match and every group extraction agree between
        Python re and DuckDB RE2 on the compiled regex — the guarantee
        the driver oracles rely on for grok-parsed pipelines."""
        pattern, fields = _render(toks)
        g = grok_compile(pattern)
        m = re.search(g.regex, line)
        con = duckdb.connect()
        db_matched = con.execute(
            "SELECT regexp_matches(?, ?)", [line, g.regex]
        ).fetchone()[0]
        assert bool(m) == bool(db_matched)
        if m:
            for i in range(len(fields)):
                db_val = con.execute(
                    "SELECT regexp_extract(?, ?, ?)", [line, g.regex, i + 1]
                ).fetchone()[0]
                assert (m.group(i + 1) or "") == (db_val or "")
