"""Hand-computed micro-cases for the oracle pipeline: claiming precedence,
OR-survival, counts, overlay, window, navigation (SURVEY.md §2.3)."""

from txtlogparser_spark.config import FilterSpec, SearchSpec, WorkspaceConfig
from txtlogparser_spark.oracle import (
    LineRec,
    run_pipeline,
    window_slice,
    format_line_prefix,
    next_match,
    prev_match,
)


def mk_lines(texts, source="s0", rank=0):
    return [
        LineRec(doc_id=f"{source}-{i:08d}", source=source, source_rank=rank, line_no=i, text=t)
        for i, t in enumerate(texts)
    ]


def ws(filters=(), searches=()):
    return WorkspaceConfig(filters=list(filters), searches=list(searches)).validate()


class TestFilters:
    def test_or_survival_and_counts(self):
        lines = mk_lines(["an error here", "all fine", "error error"])
        w = ws(filters=[FilterSpec(201, 0, "error")])
        res = run_pipeline(lines, w)
        assert [ol.rec.line_no for ol in res.lines] == [0, 2]
        # occurrence count = claimed spans (3), not lines (2): OutputData.cpp:314
        assert res.filter_match_count == {201: 3}
        assert res.filter_line_map == {201: [0, 1]}  # OUTPUT indices

    def test_no_filters_passthrough(self):
        lines = mk_lines(["a", "b"])
        res = run_pipeline(lines, ws())
        assert len(res.lines) == 2
        assert res.lines[0].filter_spans[0].filter_id == -1

    def test_first_match_wins_precedence(self):
        # filter 202 (row 0) claims 'abcd' first; 201 (row 1) only sees rest
        lines = mk_lines(["xxabcdyy"])
        w = ws(
            filters=[
                FilterSpec(201, 1, "cd"),
                FilterSpec(202, 0, "abcd"),
            ]
        )
        res = run_pipeline(lines, w)
        assert res.filter_match_count == {202: 1}
        got = [(s.start, s.end, s.filter_id) for s in res.lines[0].filter_spans]
        assert got == [(0, 2, -1), (2, 6, 202), (6, 8, -1)]

    def test_later_filter_matches_unclaimed_remainder(self):
        lines = mk_lines(["abcd cd"])
        w = ws(filters=[FilterSpec(201, 0, "abcd"), FilterSpec(202, 1, "cd")])
        res = run_pipeline(lines, w)
        # 201 claims (0,4); 202 scans remaining ' cd' segment and claims (5,7)
        assert res.filter_match_count == {201: 1, 202: 1}

    def test_order_changes_counts(self):
        lines = mk_lines(["abcd cd"])
        w = ws(filters=[FilterSpec(201, 1, "abcd"), FilterSpec(202, 0, "cd")])
        res = run_pipeline(lines, w)
        # 202 first: claims 'cd' at (2,4) and (5,7); 201 never matches
        assert res.filter_match_count == {202: 2}

    def test_source_rank_order(self):
        a = mk_lines(["hit a"], source="a", rank=1)
        b = mk_lines(["hit b"], source="b", rank=0)
        res = run_pipeline(a + b, ws(filters=[FilterSpec(201, 0, "hit")]))
        assert [ol.rec.source for ol in res.lines] == ["b", "a"]

    def test_empty_line_dropped_with_filters(self):
        lines = mk_lines(["", "x"])
        res = run_pipeline(lines, ws(filters=[FilterSpec(201, 0, "x")]))
        assert [ol.rec.line_no for ol in res.lines] == [1]


class TestSearches:
    def test_search_never_drops(self):
        lines = mk_lines(["error one", "error latency two"])
        w = ws(
            filters=[FilterSpec(201, 0, "error")],
            searches=[SearchSpec(301, 0, "latency")],
        )
        res = run_pipeline(lines, w)
        assert len(res.lines) == 2
        assert res.search_match_count == {301: 1}
        assert res.search_line_map == {301: [1]}

    def test_search_on_filtered_set_only(self):
        # 'latency' also appears in a line that filters drop → not counted
        lines = mk_lines(["latency no-match", "error latency"])
        w = ws(
            filters=[FilterSpec(201, 0, "error")],
            searches=[SearchSpec(301, 0, "latency")],
        )
        res = run_pipeline(lines, w)
        assert res.search_match_count == {301: 1}

    def test_search_scans_full_original_line(self):
        # search runs over the ORIGINAL text, incl. filter-claimed regions
        lines = mk_lines(["abcd"])
        w = ws(
            filters=[FilterSpec(201, 0, "abcd")],
            searches=[SearchSpec(301, 0, "bc")],
        )
        res = run_pipeline(lines, w)
        assert res.search_match_count == {301: 1}


class TestCombine:
    def test_search_overrides_filter_span(self):
        # filter claims (0,4) 'abcd'; search claims (1,3) 'bc' → split
        lines = mk_lines(["abcd"])
        w = ws(
            filters=[FilterSpec(201, 0, "abcd")],
            searches=[SearchSpec(301, 0, "bc")],
        )
        res = run_pipeline(lines, w)
        got = [
            (s.start, s.end, s.filter_id, s.search_id)
            for s in res.lines[0].combined_spans
        ]
        assert got == [(0, 1, 201, -1), (1, 3, -1, 301), (3, 4, 201, -1)]

    def test_non_overlapping_pass_through(self):
        lines = mk_lines(["ab cd"])
        w = ws(
            filters=[FilterSpec(201, 0, "ab")],
            searches=[SearchSpec(301, 0, "cd")],
        )
        res = run_pipeline(lines, w)
        got = [
            (s.start, s.end, s.filter_id, s.search_id)
            for s in res.lines[0].combined_spans
        ]
        assert got == [(0, 2, 201, -1), (2, 3, -1, -1), (3, 5, -1, 301)]

    def test_search_span_covering_multiple_filter_spans(self):
        # filters claim 'ab'(0,2) and 'cd'(3,5); search claims 'b cd'(1,5)
        lines = mk_lines(["ab cd"])
        w = ws(
            filters=[FilterSpec(201, 0, "ab"), FilterSpec(202, 1, "cd")],
            searches=[SearchSpec(301, 0, "b cd")],
        )
        res = run_pipeline(lines, w)
        got = [
            (s.start, s.end, s.filter_id, s.search_id)
            for s in res.lines[0].combined_spans
        ]
        assert got == [
            (0, 1, 201, -1),
            (1, 2, -1, 301),
            (2, 3, -1, 301),
            (3, 5, -1, 301),
        ]


class TestWindowNav:
    def test_window_clamp(self):
        assert window_slice(0) == (-1, -1)
        assert window_slice(5, visible=10) == (0, 4)
        assert window_slice(100, visible=10) == (0, 9)
        assert window_slice(100, visible=10, top=95) == (90, 99)

    def test_prefix_format(self):
        assert format_line_prefix(3, 2, 1, 41) == "03 [01:000042]"

    def test_next_prev_with_wrap(self):
        lines = mk_lines(["x hit", "nope", "hit hit", "zz hit"])
        res = run_pipeline(lines, ws(filters=[FilterSpec(201, 0, "hit")]))
        # surviving output lines: 0:'x hit' 1:'hit hit' 2:'zz hit'
        assert next_match(res, 201, 0, 0) == (0, 2, 5)
        # past the match on line 0 → first claimed span of next line in set
        assert next_match(res, 201, 0, 3) == (1, 0, 3)
        assert next_match(res, 201, 1, 4) == (1, 4, 7)
        # wraparound from last line past its matches
        assert next_match(res, 201, 2, 100) == (0, 2, 5)
        assert prev_match(res, 201, 2, 0) == (1, 4, 7)
        # wrap backwards from first
        assert prev_match(res, 201, 0, 0) == (2, 3, 6)
