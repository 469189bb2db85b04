"""Exact matcher semantics of the reference, line-at-a-time.

Reproduces (file:line cites into /root/reference/):
- non-regex greedy scan with ASCII case folding and isalnum whole-word
  boundaries: FilterData.cpp:110-159
- regex matching with icase + \\b wrapping: FilterData.cpp:161-238
  (dialect standardized to Python `re`; the reference uses ECMAScript
  std::regex — divergences documented in config.MatcherSpec.compiled)
- line scrubbing on load: OutputData.cpp:78-90

Quirks deliberately preserved (SURVEY.md §2.3):
- #3 the non-regex scan advances by the full pattern length after every
  candidate even when the whole-word boundary check fails (FilterData.cpp:150)
- #4 non-regex whole-word boundary = neighbor not in [0-9A-Za-z] (ASCII
  isalnum, FilterData.cpp:126-128); underscore IS a boundary here while regex
  \\b treats it as a word char — the modes disagree on "_foo_" by design.
- #5 case folding is per-byte ASCII tolower (FilterData.cpp:114-117), not
  Unicode case folding.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace
from typing import List, Tuple

from txtlogparser_spark.config import MatcherSpec

_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)
_ASCII_ALNUM = frozenset(
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)


def ascii_lower(s: str) -> str:
    """Per-byte ASCII tolower (FilterData.cpp:114-117). NOT str.lower():
    Unicode-aware lowering would diverge on non-ASCII input."""
    return s.translate(_ASCII_LOWER)


def scrub_line(line: str) -> str:
    """Line scrub on load (OutputData.cpp:78-90): strip one trailing '\\n'
    then one trailing '\\r', replace interior '\\r' with ' '."""
    if line.endswith("\n"):
        line = line[:-1]
    if line.endswith("\r"):
        line = line[:-1]
    return line.replace("\r", " ")


@dataclass(frozen=True)
class Span:
    """Half-open [start, end) char span of a line, tagged with its claimer.

    Offset-based analog of OutputSubLine (OutputLine.h:9-38), which holds
    string_views; -1 means unclaimed.
    """

    start: int
    end: int
    filter_id: int = -1
    filter_row: int = -1
    search_id: int = -1
    search_row: int = -1

    @property
    def length(self) -> int:
        return self.end - self.start


def match_non_regex(
    text: str, pattern: str, case_sensitive: bool, whole_word: bool
) -> List[Tuple[int, int]]:
    """Greedy left-to-right non-overlapping scan (FilterData.cpp:110-159).

    Returns [start, end) offsets of accepted matches. The scan position
    advances by len(pattern) after EVERY candidate, including candidates
    rejected by the whole-word check (FilterData.cpp:150) — e.g. pattern
    'aa' whole-word over 'aaa b' finds nothing (candidate at 0 fails on
    right neighbor 'a', scan resumes at 2).
    """
    if not case_sensitive:
        pattern = ascii_lower(pattern)
        content = ascii_lower(text)
    else:
        content = text
    out: List[Tuple[int, int]] = []
    if not pattern:
        return out
    plen = len(pattern)
    pos = 0
    while True:
        pos = content.find(pattern, pos)
        if pos == -1:
            break
        ok = True
        if whole_word:
            left_ok = pos == 0 or content[pos - 1] not in _ASCII_ALNUM
            right_ok = (
                pos + plen == len(content) or content[pos + plen] not in _ASCII_ALNUM
            )
            ok = left_ok and right_ok
        if ok:
            out.append((pos, pos + plen))
        pos += plen
    return out


def match_regex(text: str, compiled: re.Pattern) -> List[Tuple[int, int]]:
    """All non-overlapping matches in iteration order (std::sregex_iterator,
    FilterData.cpp:183-222 ↔ re.finditer)."""
    return [(m.start(), m.end()) for m in compiled.finditer(text)]


def match_positions(
    spec: MatcherSpec, text: str, dialect: str = "python"
) -> List[Tuple[int, int]]:
    """Dispatch on matcher mode (FilterData::apply, FilterData.cpp:95-108)."""
    if spec.regex:
        return match_regex(text, spec.compiled(dialect))
    return match_non_regex(text, spec.pattern, spec.caseSensitive, spec.wholeWord)


def apply_matcher_to_segment(
    spec: MatcherSpec, text: str, seg: Span, *, as_search: bool,
    dialect: str = "python",
) -> List[Span]:
    """Apply one matcher to one unclaimed segment, emitting the alternating
    unmatched/matched span decomposition (FilterData.cpp:129-158).

    The matcher sees ONLY the segment's substring (the reference passes the
    subline string_view), so regex anchors/boundaries evaluate against the
    segment in isolation. Empty segments produce no spans (a filter applied
    to an empty line emits nothing → the line has zero sublines and is
    dropped by OR-survival).
    """
    sub = text[seg.start : seg.end]
    positions = match_positions(spec, sub, dialect)
    out: List[Span] = []
    last = 0
    for s, e in positions:
        if s > last:
            out.append(replace(seg, start=seg.start + last, end=seg.start + s))
        claimed = Span(start=seg.start + s, end=seg.start + e)
        if as_search:
            claimed = replace(claimed, search_id=spec.id, search_row=spec.row)
        else:
            claimed = replace(claimed, filter_id=spec.id, filter_row=spec.row)
        out.append(claimed)
        last = e
    if last < len(sub):
        out.append(replace(seg, start=seg.start + last, end=seg.end))
    return out
