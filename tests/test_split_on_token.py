"""split_on_token (operators/packing.py): the inverse of packing —
split token arrays on a separator id. Independent Python model parity
over an exhaustive edge grid, keep_sep/drop_empty flag matrix, NULL
semantics, and the map-only plan shape (zero shuffle at any scale)."""

import pyspark.sql.functions as F
import pytest

from txtlogparser_spark.operators.packing import split_on_token

SEP = 99


def model(tokens, sep, keep_sep=False, drop_empty=True):
    """Independent reference: maximal runs between separators; segments
    renumbered after the empty-drop; keep_sep re-attaches the
    terminating separator to segments that have one."""
    n = len(tokens)
    sp = [i for i, t in enumerate(tokens) if t == sep]  # 0-based
    starts = [0] + [p + 1 for p in sp]
    ends = sp + [n]  # content-exclusive
    segs = []
    for s, e in zip(starts, ends):
        clen = e - s
        if drop_empty and clen == 0:
            continue
        seg_len = clen + (1 if keep_sep and e < n else 0)
        segs.append((s, seg_len, tokens[s : s + seg_len]))
    return [
        (i, s, ln, toks) for i, (s, ln, toks) in enumerate(segs)
    ]


CASES = [
    [],                                    # empty doc
    [SEP],                                 # lone separator
    [SEP, SEP, SEP],                       # all separators
    [1, 2, 3],                             # no separators
    [1, 2, SEP, 3, 4],                     # interior split
    [SEP, 1, 2],                           # leading sep
    [1, 2, SEP],                           # trailing sep (terminated)
    [SEP, 1, SEP, SEP, 2, 3, SEP, SEP],    # consecutive + both edges
    [1, SEP, 2, SEP, 3],                   # alternating
    list(range(10)) + [SEP] + list(range(10, 20)) + [SEP],
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(CASES)], ["doc_id", "tokens"]
    )


@pytest.mark.parametrize("keep_sep", [False, True])
@pytest.mark.parametrize("drop_empty", [True, False])
def test_model_parity(spark, docs, keep_sep, drop_empty):
    out = split_on_token(
        docs, sep=SEP, keep_sep=keep_sep, drop_empty=drop_empty
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r)
    for doc_id, toks in enumerate(CASES):
        want = model(toks, SEP, keep_sep=keep_sep, drop_empty=drop_empty)
        rows = sorted(got.get(doc_id, []), key=lambda r: r["seg_id"])
        assert len(rows) == len(want), (doc_id, keep_sep, drop_empty)
        for r, (wi, ws, wl, wt) in zip(rows, want):
            assert r["n_tok"] == len(toks)
            assert r["n_segments"] == len(want)
            assert (r["seg_id"], r["seg_start"], r["seg_len"]) == (
                wi, ws, wl,
            ), (doc_id, keep_sep, drop_empty)
            assert r["seg_tokens"] == wt, (doc_id, keep_sep, drop_empty)


def test_roundtrip_unpack_of_packed_stream(spark):
    """Packing docs with a trailing EOS then splitting on it recovers
    every non-empty doc in order — the actual unpack use-case."""
    docs = [[1, 2, 3], [4], [], [5, 6], [7, 8, 9, 10]]
    stream = []
    for d in docs:
        stream.extend(d + [SEP])
    df = spark.createDataFrame([(0, stream)], ["doc_id", "tokens"])
    rows = (
        split_on_token(df, sep=SEP)
        .orderBy("seg_id")
        .select("seg_tokens")
        .collect()
    )
    assert [r["seg_tokens"] for r in rows] == [d for d in docs if d]


def test_null_tokens_yield_no_rows(spark):
    df = spark.createDataFrame(
        [(0, [1, SEP, 2]), (1, None)],
        "doc_id INT, tokens ARRAY<INT>",
    )
    rows = split_on_token(df, sep=SEP).collect()
    assert sorted({r["doc_id"] for r in rows}) == [0]


def test_plan_is_map_only(spark, docs):
    plan = (
        split_on_token(docs, sep=SEP)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("Exchange", "Join", "Window", "Sort"):
        assert bad not in plan, plan
