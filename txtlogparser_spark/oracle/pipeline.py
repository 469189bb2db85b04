"""Line-at-a-time oracle of the full reference pipeline.

Reproduces OutputData::recreateOutputLines (OutputData.cpp:250-270):
  applyEnabledFilters (272-333) → applyEnabledSearches (335-387) →
  combineFiltersAndSearches (389-501) → window (OutputWindow.cpp:22-45),
plus navigation (OutputData.cpp:526-758) and the display prefix
(outputdisplaywidget.cpp:448-454, 480-484).

Semantics pinned here (SURVEY.md §2.3):
- global order = sources by source_rank (fileRow), lines by line_no
  (fileLineIndex): OutputData.cpp:274-284
- filters apply in ascending `row` order; each filter re-splits only
  still-unclaimed sublines (first-match-wins): OutputData.cpp:296-307
- OR-survival: a line survives iff ≥1 claimed subline; no enabled filters
  ⇒ every line passes: OutputData.cpp:308-329
- occurrence counts count claimed spans, not lines: OutputData.cpp:314
- line maps hold OUTPUT indices (position in the surviving ordered set),
  not input line numbers: OutputData.cpp:309,315
- searches run over the ORIGINAL text of surviving lines and never drop
  rows: OutputData.cpp:335-387
- overlay: claimed search spans override overlapping filter spans,
  splitting them into left/middle/right: OutputData.cpp:429-495
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple

from txtlogparser_spark.config import WorkspaceConfig, FilterSpec, SearchSpec
from txtlogparser_spark.oracle.matcher import Span, apply_matcher_to_segment


@dataclass(frozen=True)
class LineRec:
    """One input line ↔ FileLineInfo (OutputData.h:18-32) + payload."""

    doc_id: str
    source: str
    source_rank: int  # fileRow analog
    line_no: int  # fileLineIndex analog
    text: str
    tokens: Optional[Tuple[int, ...]] = None  # per-row invariant payload


@dataclass
class OutputLine:
    """Surviving line + span decompositions ↔ OutputLine (OutputLine.h:40-59)."""

    rec: LineRec
    output_index: int
    filter_spans: List[Span] = field(default_factory=list)
    search_spans: List[Span] = field(default_factory=list)
    combined_spans: List[Span] = field(default_factory=list)


@dataclass
class OracleResult:
    lines: List[OutputLine]
    filter_match_count: Dict[int, int]
    filter_line_map: Dict[int, List[int]]  # ordered output indices
    search_match_count: Dict[int, int]
    search_line_map: Dict[int, List[int]]


def run_pipeline(lines: Sequence[LineRec], ws: WorkspaceConfig) -> OracleResult:
    ordered = sorted(lines, key=lambda r: (r.source_rank, r.line_no))
    filters = ws.enabled_filters()
    searches = ws.enabled_searches()

    out_lines: List[OutputLine] = []
    f_count: Dict[int, int] = {}
    f_lines: Dict[int, List[int]] = {}
    s_count: Dict[int, int] = {}
    s_lines: Dict[int, List[int]] = {}

    # ---- applyEnabledFilters (OutputData.cpp:272-333) ----
    for rec in ordered:
        spans = [Span(0, len(rec.text))]
        if filters:
            for f in filters:
                nxt: List[Span] = []
                for sp in spans:
                    if sp.filter_id != -1:
                        nxt.append(sp)
                    else:
                        nxt.extend(
                            apply_matcher_to_segment(
                                f, rec.text, sp, as_search=False,
                                dialect=ws.regex_dialect,
                            )
                        )
                spans = nxt
            matched = False
            out_idx = len(out_lines)
            for sp in spans:
                if sp.filter_id != -1:
                    matched = True
                    f_count[sp.filter_id] = f_count.get(sp.filter_id, 0) + 1
                    lm = f_lines.setdefault(sp.filter_id, [])
                    if not lm or lm[-1] != out_idx:
                        lm.append(out_idx)
            if not matched:
                continue
        out_lines.append(
            OutputLine(rec=rec, output_index=len(out_lines), filter_spans=spans)
        )

    # ---- applyEnabledSearches (OutputData.cpp:335-387) ----
    for ol in out_lines:
        spans = [Span(0, len(ol.rec.text))]
        if searches:
            for s in searches:
                nxt = []
                for sp in spans:
                    if sp.search_id != -1:
                        nxt.append(sp)
                    else:
                        nxt.extend(
                            apply_matcher_to_segment(
                                s, ol.rec.text, sp, as_search=True,
                                dialect=ws.regex_dialect,
                            )
                        )
                spans = nxt
            for sp in spans:
                if sp.search_id != -1:
                    s_count[sp.search_id] = s_count.get(sp.search_id, 0) + 1
                    lm = s_lines.setdefault(sp.search_id, [])
                    if not lm or lm[-1] != ol.output_index:
                        lm.append(ol.output_index)
        ol.search_spans = spans

    # ---- combineFiltersAndSearches (OutputData.cpp:389-501) ----
    for ol in out_lines:
        ol.combined_spans = _combine(ol.filter_spans, ol.search_spans)

    return OracleResult(out_lines, f_count, f_lines, s_count, s_lines)


def _combine(filter_spans: List[Span], search_spans: List[Span]) -> List[Span]:
    if not search_spans:
        return list(filter_spans)
    if not filter_spans:
        return list(search_spans)
    combined = list(filter_spans)
    for ss in search_spans:
        if ss.search_id == -1:
            continue
        nxt: List[Span] = []
        for cs in combined:
            # Pointer comparisons on inclusive last chars (OutputData.cpp:446-453);
            # skip when no char overlap. NB on zero-length spans (the
            # inclusive-last arithmetic is asymmetric — kept faithfully):
            # a zero-length SEARCH span ss at an interior position of cs
            # passes the guard and splits cs in two there while ss itself
            # emits nothing (mid_end == mid_start); a zero-length FILTER
            # span cs skips unless a search span strictly encloses its
            # position (ss.start < cs.start < ss.end), in which case cs
            # is dropped with nothing emitted. The engine's
            # _combine_spans uses the identical arithmetic, so parity
            # holds — do not "fix" one side to the intuitive no-overlap
            # rule without the other.
            if ss.start > cs.end - 1 or ss.end - 1 < cs.start:
                nxt.append(cs)
                continue
            left = cs.start
            mid_start = max(cs.start, ss.start)
            mid_end = min(cs.end, ss.end)
            if mid_start > left:
                nxt.append(replace(cs, end=mid_start))
            if mid_end > mid_start:
                nxt.append(replace(ss, start=mid_start, end=mid_end))
            if cs.end > mid_end:
                nxt.append(replace(cs, start=mid_end))
        combined = nxt
    return combined


# ---- W1: display window (OutputWindow.cpp:22-45, OutputWindow.h:27) ----

VISIBLE_LINE_COUNT = 100_000


def window_slice(
    total: int, visible: int = VISIBLE_LINE_COUNT, top: int = -1
) -> Tuple[int, int]:
    """Clamp logic of OutputWindow::setLinesCount. Returns inclusive
    (top, bottom) indices, or (-1, -1) when empty."""
    if total <= 0:
        return (-1, -1)
    if top < 0:
        top = 0
    bottom = top + visible - 1
    if bottom >= total:
        bottom = total - 1
        top = bottom - visible + 1
        if top < 0:
            top = 0
    return (top, bottom)


def format_line_prefix(
    output_line_no: int, field_width: int, source_rank: int, line_no: int
) -> str:
    """Display prefix '%1 [%2:%3]' (outputdisplaywidget.cpp:448-454):
    1-based window position zero-padded to the width of the total count
    (outputdisplaywidget.cpp:480-484), fileRow width 2, lineIndex+1 width 6."""
    return f"{output_line_no:0{field_width}d} [{source_rank:02d}:{line_no + 1:06d}]"


# ---- N1-N4: navigation (OutputData.cpp:526-758) ----


def _line_spans(res: OracleResult, by_search: bool, out_idx: int) -> List[Span]:
    ol = res.lines[out_idx]
    return ol.search_spans if by_search else ol.filter_spans


def next_match(
    res: OracleResult,
    matcher_id: int,
    line_index: int,
    char_index: int,
    *,
    by_search: bool = False,
) -> Optional[Tuple[int, int, int]]:
    """getNextMatchByFilter/Search (OutputData.cpp:526-575, 643-692).

    line_index is an OUTPUT index. Returns (match_line_index, start, end)
    or None. Wraps past the last matching line to the first.
    """
    lmap = res.search_line_map if by_search else res.filter_line_map
    line_set = lmap.get(matcher_id)
    if not line_set:
        return None
    attr = "search_id" if by_search else "filter_id"
    if line_index in line_set:
        off = 0
        for sp in _line_spans(res, by_search, line_index):
            if off < char_index:
                off += sp.length
                continue
            if getattr(sp, attr) == matcher_id:
                return (line_index, off, off + sp.length)
            off += sp.length
    nxt = [i for i in line_set if i > line_index]
    target = nxt[0] if nxt else line_set[0]
    off = 0
    for sp in _line_spans(res, by_search, target):
        if getattr(sp, attr) == matcher_id:
            return (target, off, off + sp.length)
        off += sp.length
    return None


def prev_match(
    res: OracleResult,
    matcher_id: int,
    line_index: int,
    char_index: int,
    *,
    by_search: bool = False,
) -> Optional[Tuple[int, int, int]]:
    """getPreviousMatchByFilter/Search (OutputData.cpp:577-641, 694-758)."""
    lmap = res.search_line_map if by_search else res.filter_line_map
    line_set = lmap.get(matcher_id)
    if not line_set:
        return None
    attr = "search_id" if by_search else "filter_id"
    if line_index in line_set:
        spans = _line_spans(res, by_search, line_index)
        off = sum(sp.length for sp in spans)
        for sp in reversed(spans):
            off -= sp.length
            if off >= char_index:
                continue
            if getattr(sp, attr) == matcher_id:
                return (line_index, off, off + sp.length)
    prevs = [i for i in line_set if i < line_index]
    target = prevs[-1] if prevs else line_set[-1]
    spans = _line_spans(res, by_search, target)
    off = sum(sp.length for sp in spans)
    for sp in reversed(spans):
        off -= sp.length
        if getattr(sp, attr) == matcher_id:
            return (target, off, off + sp.length)
    return None
