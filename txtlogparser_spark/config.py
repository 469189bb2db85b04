"""Workspace configuration model.

Mirrors the reference's serialized workspace format (field names identical to
FilterData.cpp:40-64 / SearchData.cpp serialization / WorkspaceData.cpp:53-94)
so reference-era workspace.json fixtures load unchanged, but validated up
front: the reference silently emits no spans for an invalid regex at match
time (FilterData.cpp:234-237) and asserts on empty search patterns
(SearchData.cpp:100); we reject both at config-load time (documented
divergence, SURVEY.md §2.3 #6/#7).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, asdict
from typing import Iterable

FORMAT_VERSION = 1

# Id counter bases, matching WorkspaceData.h:93,96,100.
FILE_ID_BASE = 101
FILTER_ID_BASE = 201
SEARCH_ID_BASE = 301

# Deterministic 20-color pool (ColorData.cpp:10-31). Colors are config-time
# metadata only — they ride along to sink metadata, never into the data path.
COLOR_POOL = [
    "#F44336", "#DFEE15", "#37B027", "#187DCA", "#CA692D",
    "#B827BF", "#16BBC6", "#D68A8A", "#7A36C9", "#149A77",
    "#C02160", "#7A9704", "#C99836", "#2195F3", "#03F4D8",
    "#FF5722", "#607D8B", "#795548", "#9E9E9E", "#3F51B5",
]


class ConfigError(ValueError):
    """Raised for invalid workspace configuration."""


@dataclass(frozen=True)
class MatcherSpec:
    """Shared shape of filters and searches (FilterData.h:68-76 /
    SearchData.h:67-75 carry the identical field set)."""

    id: int
    row: int
    pattern: str
    caseSensitive: bool = True
    wholeWord: bool = False
    regex: bool = False
    enabled: bool = True
    color: str = ""

    def validate(self) -> None:
        if not self.pattern:
            raise ConfigError(f"matcher id={self.id}: empty pattern")
        if self.regex:
            try:
                re.compile(self.pattern)
            except re.error as e:
                raise ConfigError(
                    f"matcher id={self.id}: invalid regex {self.pattern!r}: {e}"
                ) from e

    def compiled(self) -> re.Pattern | None:
        """Python `re` pattern for regex mode, reproducing the reference's
        flag handling (FilterData.cpp:161-238): icase when not caseSensitive,
        wholeWord wraps the pattern in \\b...\\b.

        Dialect note: the reference uses ECMAScript std::regex; we standardize
        on Python `re`. Divergences (e.g. ECMAScript lacks lookbehind pre-C++23,
        differing \\b corner cases) are documented, not emulated.
        """
        if not self.regex:
            return None
        pat = self.pattern
        if self.wholeWord:
            pat = r"\b" + pat + r"\b"  # FilterData.cpp:167
        flags = 0 if self.caseSensitive else re.IGNORECASE
        return re.compile(pat, flags)


@dataclass(frozen=True)
class FilterSpec(MatcherSpec):
    """Routing predicate — rows survive iff ≥1 enabled filter claims a span
    (OR-semantics, OutputData.cpp:308-329)."""


@dataclass(frozen=True)
class SearchSpec(MatcherSpec):
    """Annotation predicate — adds match spans over routed rows, never drops
    rows (OutputData.cpp:335-387)."""


@dataclass
class SourceSpec:
    """File analog (FileData.h:66-73): `source` partition of the input table.

    source_rank ↔ fileRow display order; the global output total order is
    (source_rank, line_no) (OutputData.cpp:274-284).
    """

    source: str
    source_rank: int
    selected: bool = True


@dataclass
class WorkspaceConfig:
    id: int = 1
    name: str = "workspace"
    filters: list[FilterSpec] = field(default_factory=list)
    searches: list[SearchSpec] = field(default_factory=list)
    sources: list[SourceSpec] = field(default_factory=list)

    def validate(self) -> "WorkspaceConfig":
        seen: set[int] = set()
        for m in [*self.filters, *self.searches]:
            m.validate()
            if m.id in seen:
                raise ConfigError(f"duplicate matcher id {m.id}")
            seen.add(m.id)
        for coll, kind in ((self.filters, "filter"), (self.searches, "search")):
            rows = [m.row for m in coll]
            if len(rows) != len(set(rows)):
                raise ConfigError(f"duplicate {kind} row values {rows}")
        return self

    # ---- application order (std::map keyed by row, OutputData.h:106,113) ----
    def enabled_filters(self) -> list[FilterSpec]:
        return sorted((f for f in self.filters if f.enabled), key=lambda f: f.row)

    def enabled_searches(self) -> list[SearchSpec]:
        return sorted((s for s in self.searches if s.enabled), key=lambda s: s.row)

    def selected_sources(self) -> list[str]:
        return [s.source for s in self.sources if s.selected]

    # ---- (de)serialization, reference-compatible field names ----
    @classmethod
    def from_dict(cls, d: dict) -> "WorkspaceConfig":
        return cls(
            id=d.get("id", 1),
            name=d.get("name", "workspace"),
            filters=[_matcher_from_dict(FilterSpec, f) for f in d.get("filters", [])],
            searches=[_matcher_from_dict(SearchSpec, s) for s in d.get("searches", [])],
            sources=[
                SourceSpec(
                    source=s["source"],
                    source_rank=s.get("source_rank", i),
                    selected=s.get("selected", True),
                )
                for i, s in enumerate(d.get("sources", []))
            ],
        ).validate()

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "name": self.name,
            "filters": [asdict(f) for f in self.filters],
            "searches": [asdict(s) for s in self.searches],
            "sources": [asdict(s) for s in self.sources],
        }

    def digest(self) -> str:
        """Stable content digest of the config — keyed into run manifests
        so a resume can refuse to continue under a changed workspace
        (the pipeline is only deterministic per (config, input))."""
        import hashlib
        import json as _json

        return hashlib.md5(
            _json.dumps(self.to_dict(), sort_keys=True).encode()
        ).hexdigest()


def _matcher_from_dict(cls, d: dict):
    # Defaulted-field load semantics as in FilterData.cpp:53-64.
    return cls(
        id=int(d["id"]),
        row=int(d["row"]),
        pattern=str(d["pattern"]),
        caseSensitive=bool(d.get("caseSensitive", True)),
        wholeWord=bool(d.get("wholeWord", False)),
        regex=bool(d.get("regex", False)),
        enabled=bool(d.get("enabled", True)),
        color=str(d.get("color", "")),
    )


def load_workspaces(path: str) -> list[WorkspaceConfig]:
    """Load a workspaces.json (WorkspaceManager.cpp:78-143): version-check the
    root `formatVersion`, refuse incompatible files."""
    with open(path) as fh:
        doc = json.load(fh)
    version = doc.get("formatVersion")
    if version != FORMAT_VERSION:
        raise ConfigError(f"unsupported formatVersion {version!r}")
    return [WorkspaceConfig.from_dict(w) for w in doc.get("workspaces", [])]


def save_workspaces(path: str, workspaces: Iterable[WorkspaceConfig]) -> None:
    doc = {
        "formatVersion": FORMAT_VERSION,
        "workspaces": [w.to_dict() for w in workspaces],
    }
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=2)


class ColorManager:
    """Deterministic color assignment (FilterSearchColorManager.cpp:9-67):
    getNextColor = smallest-index pool color not currently in use."""

    def __init__(self) -> None:
        self._used: dict[str, int] = {}

    def next_color(self) -> str:
        for c in COLOR_POOL:
            if not self._used.get(c):
                self._used[c] = 1
                return c
        # Pool exhausted: reference reuses pool[0] (wrap).
        self._used[COLOR_POOL[0]] = self._used.get(COLOR_POOL[0], 0) + 1
        return COLOR_POOL[0]

    def push(self, color: str) -> None:
        self._used[color] = self._used.get(color, 0) + 1

    def pop(self, color: str) -> None:
        if self._used.get(color, 0) > 0:
            self._used[color] -= 1
