"""Hand-computed micro-cases pinning the oracle matcher semantics
(SURVEY.md §2.3 quirk list; cites into /root/reference/)."""

import re

import pytest

from txtlogparser_spark.config import (
    ConfigError,
    FilterSpec,
    MatcherSpec,
    SearchSpec,
    WorkspaceConfig,
    ColorManager,
    COLOR_POOL,
)
from txtlogparser_spark.oracle import (
    Span,
    ascii_lower,
    match_non_regex,
    match_regex,
    apply_matcher_to_segment,
    scrub_line,
)


def spans(pairs):
    return list(pairs)


class TestNonRegex:
    def test_simple(self):
        assert match_non_regex("an error here", "error", True, False) == [(3, 8)]

    def test_multiple_non_overlapping(self):
        assert match_non_regex("ababab", "ab", True, False) == [(0, 2), (2, 4), (4, 6)]

    def test_greedy_skip_overlap(self):
        # 'aaa' has only ONE non-overlapping 'aa' match (pos then +=2)
        assert match_non_regex("aaa", "aa", True, False) == [(0, 2)]

    def test_case_insensitive_ascii(self):
        assert match_non_regex("An ERROR and error", "Error", False, False) == [
            (3, 8),
            (13, 18),
        ]

    def test_ascii_lower_not_unicode(self):
        # per-byte ASCII tolower (FilterData.cpp:114-117): Unicode untouched
        assert ascii_lower("ÀBC") == "ÀBc"[:0] + "À" + "bc"

    def test_whole_word_boundaries(self):
        assert match_non_regex("a word here", "word", True, True) == [(2, 6)]
        assert match_non_regex("sword here", "word", True, True) == []
        assert match_non_regex("word", "word", True, True) == [(0, 4)]

    def test_whole_word_underscore_is_boundary(self):
        # quirk #4: isalnum boundary — '_' is NOT alnum, so '_foo_' matches
        # in non-regex whole-word mode (regex \b would not).
        assert match_non_regex("_foo_", "foo", True, True) == [(1, 4)]

    def test_whole_word_digit_blocks(self):
        assert match_non_regex("foo1 foo", "foo", True, True) == [(5, 8)]

    def test_greedy_advance_on_failed_wholeword(self):
        # quirk #3 (FilterData.cpp:150): candidate at 0 fails (right
        # neighbor 'a'), scan resumes at 2, finds nothing.
        assert match_non_regex("aaa b", "aa", True, True) == []
        # candidate at 0 fails, resume at 2: 'aa' at 3? 'aab aa': a,a,b,' ',a,a
        assert match_non_regex("aab aa", "aa", True, True) == [(4, 6)]

    def test_empty_text(self):
        assert match_non_regex("", "x", True, False) == []


class TestRegex:
    def test_basic(self):
        p = re.compile(r"code=\d+")
        assert match_regex("err code=500 ok code=7", p) == [(4, 12), (16, 22)]

    def test_icase_via_spec(self):
        spec = MatcherSpec(1, 0, "ERROR", caseSensitive=False, regex=True)
        assert match_regex("an error", spec.compiled()) == [(3, 8)]

    def test_wholeword_wraps_word_boundary(self):
        # regex mode uses \b (FilterData.cpp:167): underscore is a word char,
        # so '_foo_' does NOT match — diverges from non-regex mode by design.
        spec = MatcherSpec(1, 0, "foo", wholeWord=True, regex=True)
        assert match_regex("_foo_", spec.compiled()) == []
        assert match_regex(" foo ", spec.compiled()) == [(1, 4)]


class TestSegmentDecomposition:
    def test_alternating_spans(self):
        f = FilterSpec(201, 0, "ab")
        seg = Span(0, 7)
        got = apply_matcher_to_segment(f, "xxabyab", seg, as_search=False)
        assert [(s.start, s.end, s.filter_id) for s in got] == [
            (0, 2, -1),
            (2, 4, 201),
            (4, 5, -1),
            (5, 7, 201),
        ]

    def test_segment_offsets_applied(self):
        f = FilterSpec(201, 0, "ab")
        seg = Span(3, 7)  # matcher must only see text[3:7]
        got = apply_matcher_to_segment(f, "abcdabx", seg, as_search=False)
        assert [(s.start, s.end, s.filter_id) for s in got] == [
            (3, 4, -1),
            (4, 6, 201),
            (6, 7, -1),
        ]

    def test_no_match_single_unclaimed(self):
        f = FilterSpec(201, 0, "zz")
        got = apply_matcher_to_segment(f, "abc", Span(0, 3), as_search=False)
        assert [(s.start, s.end, s.filter_id) for s in got] == [(0, 3, -1)]

    def test_search_tags_search_fields(self):
        s = SearchSpec(301, 0, "b")
        got = apply_matcher_to_segment(s, "abc", Span(0, 3), as_search=True)
        assert [(sp.start, sp.end, sp.filter_id, sp.search_id) for sp in got] == [
            (0, 1, -1, -1),
            (1, 2, -1, 301),
            (2, 3, -1, -1),
        ]


class TestScrub:
    def test_scrub(self):
        # OutputData.cpp:78-90
        assert scrub_line("abc\n") == "abc"
        assert scrub_line("abc\r\n") == "abc"
        assert scrub_line("a\rb\r\n") == "a b"
        assert scrub_line("abc\r") == "abc"


class TestConfig:
    def test_invalid_regex_rejected(self):
        with pytest.raises(ConfigError):
            WorkspaceConfig(
                filters=[FilterSpec(201, 0, "(unclosed", regex=True)]
            ).validate()

    def test_empty_pattern_rejected(self):
        with pytest.raises(ConfigError):
            WorkspaceConfig(filters=[FilterSpec(201, 0, "")]).validate()

    def test_roundtrip(self, tmp_path):
        from txtlogparser_spark.config import load_workspaces, save_workspaces

        ws = WorkspaceConfig(
            id=1,
            filters=[FilterSpec(201, 0, "ERROR", color="#F44336")],
            searches=[SearchSpec(301, 0, "latency", caseSensitive=False)],
        )
        p = tmp_path / "workspaces.json"
        save_workspaces(str(p), [ws])
        (back,) = load_workspaces(str(p))
        assert back.filters == ws.filters
        assert back.searches == ws.searches

    def test_color_pool_determinism(self):
        # FilterSearchColorManager.cpp:23-35: smallest-index unused
        cm = ColorManager()
        a, b = cm.next_color(), cm.next_color()
        assert (a, b) == (COLOR_POOL[0], COLOR_POOL[1])
        cm.pop(a)
        assert cm.next_color() == COLOR_POOL[0]
