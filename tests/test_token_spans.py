"""Token-table fast path (functions/token_spans.py) equality tests.

The fast path claims: for word-local matchers, per-line span decomposition
== concatenation of per-vocab-word decompositions with merged unclaimed
gaps. These tests pin that equality against the generic whole-line
extractor (itself pinned against the pure-Python oracle port of
FilterData.cpp/OutputData.cpp by test_spans_property.py).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from txtlogparser_spark.config import FilterSpec, SearchSpec
from txtlogparser_spark.functions.spans import _matcher_table, extract_line_spans
from txtlogparser_spark.functions.token_spans import (
    build_word_tables,
    matchers_word_local,
    pattern_word_local,
    spans_for_ids,
)

# A vocabulary exercising every matcher quirk word-locally: case variants,
# underscores (isalnum-vs-\b divergence), repeated substrings (greedy
# advance quirk), digits, and plain filler.
VOCAB = [
    "ERROR", "Error", "error", "errors", "WARN", "warn", "warning",
    "conn_error", "db_conn_error", "_retry_", "retry", "aaa", "abab", "aa",
    "code=200", "code=404", "latency=123ms", "latency=7ms", "x", "filler",
    "w0001", "w0002", "GET", "POST",
]


def _spans_via_tokens(ids, filters, searches, want_combined=True):
    wlen, has_claim, ff, sf, cf = build_word_tables(
        VOCAB, filters, searches, want_search=True, want_combined=want_combined
    )
    return spans_for_ids(
        np.asarray(ids, dtype=np.int64),
        wlen,
        has_claim,
        ff,
        sf,
        cf,
        want_search=True,
        want_combined=want_combined,
    )


def _spans_via_text(ids, filters, searches, want_combined=True):
    text = " ".join(VOCAB[i] for i in ids)
    ftab = _matcher_table(filters)
    stab = _matcher_table(searches)
    return extract_line_spans(text, ftab, stab, want_combined)


WORKSPACES = [
    # all 4 flag combos, non-regex + regex, in orders that force claiming
    (
        [
            FilterSpec(201, 0, "ERROR", caseSensitive=True),
            FilterSpec(202, 1, "warn", caseSensitive=False, wholeWord=True),
            FilterSpec(203, 2, r"code=\d+", caseSensitive=False, regex=True),
            FilterSpec(204, 3, r"conn_error", caseSensitive=False, wholeWord=True, regex=True),
        ],
        [
            SearchSpec(301, 0, "latency", caseSensitive=False),
            SearchSpec(302, 1, r"\d+ms", caseSensitive=False, regex=True),
        ],
    ),
    # overlap-bait: earlier filter claims inside words later filters want
    (
        [
            FilterSpec(201, 0, "aa", caseSensitive=True),
            FilterSpec(202, 1, "ab", caseSensitive=True),
            FilterSpec(203, 2, "a", caseSensitive=True, wholeWord=True),
        ],
        [SearchSpec(301, 0, "b", caseSensitive=True)],
    ),
    # whole-word quirks: underscore boundary divergence non-regex vs \b
    (
        [
            FilterSpec(201, 0, "retry", caseSensitive=False, wholeWord=True),
            FilterSpec(202, 1, r"retry", caseSensitive=False, wholeWord=True, regex=True),
            FilterSpec(203, 2, "error", caseSensitive=False, wholeWord=True),
        ],
        [SearchSpec(301, 0, r"err\w+", caseSensitive=False, regex=True)],
    ),
]


@pytest.mark.parametrize("ws_idx", range(len(WORKSPACES)))
def test_token_tables_match_generic_extractor(ws_idx):
    filters, searches = WORKSPACES[ws_idx]
    assert matchers_word_local(filters, searches)
    rng = np.random.RandomState(7 + ws_idx)
    for _ in range(300):
        k = rng.randint(1, 30)
        ids = rng.randint(0, len(VOCAB), size=k).tolist()
        got = _spans_via_tokens(ids, filters, searches)
        want = _spans_via_text(ids, filters, searches)
        assert got[0] == want[0], f"filter spans differ for ids={ids}"
        assert got[1] == want[1], f"search spans differ for ids={ids}"
        assert got[2] == want[2], f"combined spans differ for ids={ids}"


@settings(max_examples=200, deadline=None)
@given(
    ids=st.lists(st.integers(0, len(VOCAB) - 1), min_size=1, max_size=20),
    ws_idx=st.integers(0, len(WORKSPACES) - 1),
)
def test_token_tables_property(ids, ws_idx):
    filters, searches = WORKSPACES[ws_idx]
    got = _spans_via_tokens(ids, filters, searches)
    want = _spans_via_text(ids, filters, searches)
    assert got[0] == want[0]
    assert got[1] == want[1]
    assert got[2] == want[2]


def test_empty_ids_matches_generic_path():
    """Empty token array == extract_line_spans(""): the reference drops
    the empty subline after the first non-claiming filter
    (FilterData.cpp:154-159/221-229, OutputData.cpp:291-306), so the
    token fast path must NOT emit a synthetic whole-line span."""
    for filters, searches in WORKSPACES:
        got = _spans_via_tokens([], filters, searches)
        want = _spans_via_text([], filters, searches)
        assert got[0] == want[0], (filters, searches)
        assert got[1] == want[1], (filters, searches)
        assert got[2] == want[2], (filters, searches)


def test_empty_ids_reference_shapes():
    # non-claiming filter first: empty line vanishes (empty span list),
    # a LATER zero-width regex never sees it
    filters = [
        FilterSpec(201, 0, "a", caseSensitive=True, wholeWord=False, regex=False),
        FilterSpec(202, 1, "x*", caseSensitive=True, wholeWord=False, regex=True),
    ]
    fs, ss, cs = _spans_via_tokens([], filters, [])
    assert fs == []
    # zero-width regex FIRST: claims the empty line at (0,0)
    filters = [
        FilterSpec(202, 0, "x*", caseSensitive=True, wholeWord=False, regex=True)
    ]
    fs, ss, cs = _spans_via_tokens([], filters, [])
    assert [sp[:3] for sp in fs] == [(0, 0, 202)]
    # no filters at all: the untouched whole-(empty-)line span survives
    fs, ss, cs = _spans_via_tokens([], [], [])
    assert fs == [(0, 0, -1, -1, -1, -1)]


def test_word_locality_gate():
    ok = [
        ("ERROR", False),
        ("code=\\d+", True),
        ("\\bconn_error\\b", True),
        ("b(ig|atch)", True),
        ("[abc]+x", True),
    ]
    ok += [
        (r"\S+", True),         # cannot match the separator
        (r"(foo)+bar", True),   # groups/repeats of word-local parts
        (r"a\Bb", True),        # \B is word-local like \b
    ]
    bad = [
        ("two words", False),   # literal separator
        ("a b", True),
        (r"\s+", True),         # class containing space
        (r"\W", True),
        ("^start", True),       # anchor
        ("end$", True),
        (r"foo(?= bar)", True), # lookahead
        ("a.c", True),          # dot matches separator
        ("[^x]+", True),        # negated class
        ("a*", True),           # can match empty → positions at separator
        ("(x|)", True),
        # tree-walk catches what textual scans miss (ADVICE round 1):
        (r"[\x1f-\x21]+", True),  # range spanning 0x20
        (r"[\t-z]+", True),       # range spanning 0x20
        ("\\u0020", True),        # escaped space literal
        (r"\x20", True),
        (r"\040", True),
        (r"a|b c", True),         # space in one branch
        (r"[\x19\x20]", True),    # class literal 0x20 via escape
        (r"(a)\1", True),         # backref: conservative reject
    ]
    for pat, is_re in ok:
        assert pattern_word_local(pat, is_re), pat
    for pat, is_re in bad:
        assert not pattern_word_local(pat, is_re), pat


# --------------------------------------------- gate property (random ASTs)
#
# The gate's contract: ANY pattern it admits is word-local — the fast
# path equals the generic whole-line extractor on space-containing
# inputs. Generating random regex ASTs (not hand-picked cases) means a
# future sre node kind the walk doesn't know fails CLOSED with evidence:
# either the gate rejects it (fine, speed-only loss) or this property
# finds the divergence.

_GATE_ATOMS = [
    "a", "b", "A", "1", "_", " ", r"\ ", ".", r"\d", r"\D", r"\w", r"\W",
    r"\s", r"\S", r"\b", r"\B", "^", "$", r"\x20", r"\x21",
    "[ab]", "[^a]", "[a-c]", r"[\x1f-\x21]", "[ a]", "[^ ]", "[a1_]",
    r"[\t-z]", r"[^\S]",
]
_GATE_QUANTS = ["", "*", "+", "?", "{1,2}", "*?", "+?"]


def _regex_ast(depth: int):
    atom = st.sampled_from(_GATE_ATOMS)
    if depth <= 0:
        return atom
    sub = _regex_ast(depth - 1)
    piece = st.builds(
        lambda e, q: e + q, st.one_of(atom, sub), st.sampled_from(_GATE_QUANTS)
    )
    return st.one_of(
        atom,
        st.builds(lambda a, b: a + b, piece, piece),                  # concat
        st.builds(lambda a, b: f"(?:{a}|{b})", sub, sub),             # alt
        st.builds(lambda e: f"({e})", sub),                           # group
        st.builds(lambda e: f"(?={e})", sub),                         # lookahead
        st.builds(lambda e: f"(?!{e})", sub),                         # neg look
    )


def _finditer_spans(creg, text, off=0):
    return [(m.start() + off, m.end() + off) for m in creg.finditer(text)]


@settings(max_examples=300, deadline=None)
@given(pat=_regex_ast(2), data=st.data())
def test_gate_admitted_random_asts_are_word_local(pat, data):
    import re

    try:
        creg = re.compile(pat)
    except re.error:
        return
    if not pattern_word_local(pat, True):
        return  # conservative reject: generic path handles it, only speed lost
    vocab = data.draw(
        st.lists(
            st.text(alphabet="abA1_.", min_size=1, max_size=5),
            min_size=1,
            max_size=6,
            unique=True,
        )
    )
    ids = data.draw(
        st.lists(st.integers(0, len(vocab) - 1), min_size=0, max_size=8)
    )
    line = " ".join(vocab[i] for i in ids)
    # (1) raw re locality: matches on the line == shifted per-word matches
    per_word, off = [], 0
    for i in ids:
        per_word += _finditer_spans(creg, vocab[i], off)
        off += len(vocab[i]) + 1
    assert _finditer_spans(creg, line) == per_word, pat
    # (2) full engine equality: token-table fast path == generic extractor
    filters = [
        FilterSpec(201, 0, pat, caseSensitive=True, wholeWord=False, regex=True)
    ]
    wlen, has_claim, ff, sf, cf = build_word_tables(
        vocab, filters, [], want_search=True, want_combined=True
    )
    got = spans_for_ids(
        np.asarray(ids, dtype=np.int64), wlen, has_claim, ff, sf, cf,
        want_search=True, want_combined=True,
    )
    ftab = _matcher_table(filters)
    stab = _matcher_table([])
    want = extract_line_spans(line, ftab, stab, True)
    assert got == want, pat


def test_pipeline_paths_agree(spark, tmp_path):
    """Spark-level: token-table plan == generic fused plan on fixture data."""
    from txtlogparser_spark.plans.pipeline import LogPipeline
    from txtlogparser_spark.sources.fixtures import (
        FixtureSpec,
        build_vocab,
        default_workspace,
        write_fixture_tables,
    )

    out = str(tmp_path / "fix")
    # empty_fraction: ~2% of rows carry an EMPTY token array — all three
    # paths must agree on the empty-line reference semantics too
    write_fixture_tables(
        out, FixtureSpec(n_rows=2000, n_sources=3, seed=11, empty_fraction=0.02)
    )
    info = spark.read.parquet(f"{out}/source_info.parquet")
    ws = default_workspace()
    assert matchers_word_local(ws.enabled_filters(), ws.enabled_searches())
    pipe = LogPipeline(spark, ws, build_vocab(), source_info=info)
    seqs = pipe.load_sequences(f"{out}/sequences")

    cols = ["doc_id", "text", "filter_spans", "search_spans", "route"]
    fast = {
        r["doc_id"]: r
        for r in pipe.run(seqs, token_tables=True, arrow_path=False)
        .select(cols)
        .collect()
    }
    slow = {
        r["doc_id"]: r
        for r in pipe.run(seqs, token_tables=False).select(cols).collect()
    }
    arrow = {
        r["doc_id"]: r
        for r in pipe.run(seqs, token_tables=True, arrow_path=True)
        .select(cols)
        .collect()
    }
    assert set(fast) == set(slow) == set(arrow)
    assert len(fast) > 0
    for k in fast:
        assert fast[k] == slow[k], f"row {k} differs (pandas-token vs generic)"
        assert arrow[k] == slow[k], f"row {k} differs (arrow vs generic)"

    # with_text=False: same spans/route, text reconstructible on demand
    slim = pipe.run(seqs, token_tables=True, with_text=False)
    assert "text" not in slim.columns
    redone = {
        r["doc_id"]: r
        for r in pipe.display_text(slim).select(cols).collect()
    }
    assert set(redone) == set(fast)
    for k in fast:
        assert redone[k] == fast[k], f"slim row {k} differs"

    # flat sink shape (assembled=False): same survival/routes, and the
    # flat metrics equal the assembled metrics
    from txtlogparser_spark.operators.aggregate import (
        filter_metrics,
        filter_metrics_flat,
        search_metrics,
        search_metrics_flat,
    )

    flat = pipe.run(seqs, with_text=False, assembled=False)
    assert "filter_spans" not in flat.columns and "f_id" in flat.columns
    routes_flat = sorted(
        (r["doc_id"], r["route"]) for r in flat.select("doc_id", "route").collect()
    )
    routes_asm = sorted((k, fast[k]["route"]) for k in fast)
    assert routes_flat == routes_asm
    asm = pipe.run(seqs, with_text=False)
    fm = {r["filter_id"]: (r["occurrence_count"], r["line_count"])
          for r in filter_metrics(asm).collect()}
    fmf = {r["filter_id"]: (r["occurrence_count"], r["line_count"])
           for r in filter_metrics_flat(flat).collect()}
    assert fm == fmf
    sm = {r["search_id"]: (r["occurrence_count"], r["line_count"])
          for r in search_metrics(asm).collect()}
    smf = {r["search_id"]: (r["occurrence_count"], r["line_count"])
           for r in search_metrics_flat(flat).collect()}
    assert sm == smf


def test_forced_arrow_path_raises_when_not_word_local(spark, tmp_path):
    """Review finding: run(arrow_path=True) with non-word-local matchers
    silently fell back to the generic pandas path; every other force
    flag raises loudly in its impossible configuration — this one now
    does too."""
    import pytest as _pytest

    from txtlogparser_spark.config import FilterSpec, WorkspaceConfig
    from txtlogparser_spark.plans.pipeline import LogPipeline
    from txtlogparser_spark.sources.fixtures import (
        FixtureSpec,
        build_vocab,
        write_fixture_tables,
    )

    out = str(tmp_path / "fix")
    write_fixture_tables(out, FixtureSpec(n_rows=200, n_sources=2, seed=7))
    info = spark.read.parquet(f"{out}/source_info.parquet")
    # a multi-word phrase matcher is not word-local
    ws = WorkspaceConfig(id=1, name="w", filters=[FilterSpec(201, 0, "big batch")])
    assert not matchers_word_local(ws.enabled_filters(), [])
    pipe = LogPipeline(spark, ws, build_vocab(), source_info=info)
    seqs = pipe.load_sequences(f"{out}/sequences")
    with _pytest.raises(ValueError, match="arrow_path=True requires"):
        pipe.run(seqs, arrow_path=True, with_search=False)
    # unforced: the gate quietly picks the generic path and still runs
    assert pipe.run(seqs, with_search=False).count() >= 0


def test_empty_rows_through_spark_and_arrow_paths(spark):
    """The UDF and the mapInArrow mapper each short-circuit empty/null
    token rows BEFORE spans_for_ids — those branches must emit the same
    empty-line sentinel (reference: the empty line vanishes after the
    first non-claiming filter; the r4 parity bug lived exactly here)."""
    import pyarrow as pa
    import pyspark.sql.functions as F

    from txtlogparser_spark.functions.arrow_spans import make_arrow_span_mapper
    from txtlogparser_spark.functions.token_spans import make_token_fused_extractor

    filters, searches = WORKSPACES[0]
    rows = [[], [0, 1, 2], None, [4]]
    want = [
        _spans_via_text(ids if ids is not None else [], filters, searches)[0]
        for ids in rows
    ]

    # pandas-UDF path
    df = spark.createDataFrame([(r,) for r in rows], "tokens array<int>")
    udf = make_token_fused_extractor(VOCAB, filters, searches)
    got = (
        df.withColumn("_f", udf(F.col("tokens")))
        .select(F.arrays_zip("_f.f_start", "_f.f_end", "_f.f_id", "_f.f_row").alias("z"))
        .collect()
    )
    for w, r in zip(want, got):
        flat = [(t["f_start"], t["f_end"], t["f_id"], t["f_row"]) for t in r["z"]]
        assert flat == [sp[:4] for sp in w], (flat, w)

    # mapInArrow path (mapper called directly on a RecordBatch)
    fn, _ = make_arrow_span_mapper(VOCAB, filters, searches)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(rows, type=pa.list_(pa.int32()))], names=["tokens"]
    )
    (out,) = list(fn(iter([batch])))
    tab = out.to_pydict()
    for i, w in enumerate(want):
        flat = list(
            zip(tab["f_start"][i], tab["f_end"][i], tab["f_id"][i], tab["f_row"][i])
        )
        assert flat == [sp[:4] for sp in w], (i, flat, w)
