"""window_slices (operators/packing.py): per-document sliding-window
chunking with overlap — independent Python model parity, edge cases,
and the map-only plan shape (zero shuffle at any scale)."""

import math

import pyspark.sql.functions as F
import pytest


def model(tokens, max_len, stride, min_len=1):
    """Independent reference: window i starts at i*stride; a doc with
    n <= max_len yields exactly one window; short tails under min_len
    drop."""
    n = len(tokens)
    if n <= max_len:
        n_win = 1
    else:
        n_win = math.ceil((n - max_len) / stride) + 1
    out = []
    for i in range(n_win):
        w = tokens[i * stride : i * stride + max_len]
        if len(w) >= min_len:
            out.append((i, i * stride, len(w), w))
    return n_win, out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, list(range(100))),   # 100 tokens: multi-window
        (1, list(range(8))),     # n == max_len boundary (max_len=8)
        (2, list(range(9))),     # one past the boundary
        (3, list(range(3))),     # short doc: single window, short
        (4, []),                 # empty: zero windows
        (5, list(range(17))),    # tail lands exactly on a stride step
    ]
    return spark.createDataFrame(rows, ["doc_id", "tokens"])


class TestWindowSlices:
    @pytest.mark.parametrize("max_len,stride", [(8, 8), (8, 6), (8, 2), (32, 24)])
    def test_matches_independent_model(self, spark, docs, max_len, stride):
        from txtlogparser_spark.operators.packing import window_slices

        got = {
            (r["doc_id"], r["win_id"]): (
                r["n_windows"],
                r["win_start"],
                r["win_len"],
                r["win_tokens"],
            )
            for r in window_slices(
                docs, max_len=max_len, stride=stride
            ).collect()
        }
        want = {}
        for doc_id, toks in [
            (0, list(range(100))),
            (1, list(range(8))),
            (2, list(range(9))),
            (3, list(range(3))),
            (4, []),
            (5, list(range(17))),
        ]:
            n_win, wins = model(toks, max_len, stride)
            for i, start, ln, w in wins:
                want[(doc_id, i)] = (n_win, start, ln, w)
        assert got == want

    def test_overlap_reconstructs_prefix(self, spark, docs):
        """stride < max_len: consecutive windows overlap by
        max_len - stride tokens and window starts advance by stride."""
        from txtlogparser_spark.operators.packing import window_slices

        rows = (
            window_slices(docs.where("doc_id = 0"), max_len=8, stride=6)
            .orderBy("win_id")
            .collect()
        )
        toks = list(range(100))
        for a, b in zip(rows, rows[1:]):
            assert a["win_tokens"][6:] == b["win_tokens"][:2]
        # every token position is covered
        covered = set()
        for r in rows:
            covered.update(range(r["win_start"], r["win_start"] + r["win_len"]))
        assert covered == set(range(100))
        assert [r["win_tokens"] for r in rows] == [
            toks[i * 6 : i * 6 + 8] for i in range(len(rows))
        ]

    def test_min_len_drops_short_tails(self, spark, docs):
        from txtlogparser_spark.operators.packing import window_slices

        # doc 2 (9 tokens, max_len=8, stride=8): tail window has 1 token
        out = window_slices(
            docs.where("doc_id = 2"), max_len=8, stride=8, min_len=2
        ).collect()
        assert [r["win_id"] for r in out] == [0]
        kept = window_slices(
            docs.where("doc_id = 2"), max_len=8, stride=8, min_len=1
        ).collect()
        assert sorted(r["win_id"] for r in kept) == [0, 1]

    def test_map_only_plan(self, spark, docs):
        """100 TB shape: projection + generator only — no Exchange, no
        Python stage, no window function."""
        from txtlogparser_spark.operators.packing import window_slices

        plan = (
            window_slices(docs, max_len=8, stride=6)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan and "ArrowEval" not in plan
        assert "Window" not in plan

    def test_exhaustive_length_grid(self, spark):
        """Every doc length 0..40 against boundary-heavy (max_len,
        stride) combos — including stride > max_len (step semantics:
        windows may skip tokens; the count formula still holds)."""
        from txtlogparser_spark.operators.packing import window_slices

        all_docs = [(n, list(range(n))) for n in range(41)]
        frame = spark.createDataFrame(all_docs, ["doc_id", "tokens"])
        for max_len, stride in [(1, 1), (4, 4), (4, 3), (4, 1), (5, 7), (40, 13)]:
            got = {
                (r["doc_id"], r["win_id"]): (
                    r["n_windows"],
                    r["win_start"],
                    r["win_len"],
                    r["win_tokens"],
                )
                for r in window_slices(
                    frame, max_len=max_len, stride=stride
                ).collect()
            }
            want = {}
            for doc_id, toks in all_docs:
                n_win, wins = model(toks, max_len, stride)
                for i, start, ln, w in wins:
                    want[(doc_id, i)] = (n_win, start, ln, w)
            assert got == want, (max_len, stride)

    def test_null_tokens_yield_no_windows(self, spark):
        """NULL token arrays produce zero windows (the window array is
        NULL and posexplode skips it) — same observable contract as an
        empty doc, no NULL rows leak into the output."""
        from txtlogparser_spark.operators.packing import window_slices

        frame = spark.createDataFrame(
            [(0, None), (1, [1, 2, 3])],
            "doc_id long, tokens array<int>",
        )
        rows = window_slices(frame, max_len=2, stride=2).collect()
        assert sorted((r["doc_id"], r["win_id"]) for r in rows) == [
            (1, 0),
            (1, 1),
        ]

    def test_validates_args(self, spark, docs):
        from txtlogparser_spark.operators.packing import window_slices

        with pytest.raises(ValueError):
            window_slices(docs, max_len=0)
        with pytest.raises(ValueError):
            window_slices(docs, max_len=8, stride=0)
