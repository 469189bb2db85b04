"""Grok pattern front-end for the parse stage (north_star: "vectorized
grok/regex extraction ... decodes structured fields").

`%{NAME:field}` / `%{NAME:field:int}` / `%{NAME}` syntax compiles to a
single Java regex whose capture groups are the named fields in
occurrence order; extraction is then plain Catalyst `regexp_extract`
per field — JVM-side, map-only, whole-stage-codegen, no Python. The
built-in pattern library is written RE2-compatible (no backrefs, no
lookaround) so every compiled grok also replays under DuckDB's
regexp_extract for oracle parity (tests/test_grok.py).

Custom definitions may reference other patterns recursively
(cycle-checked) and MUST use non-capturing groups `(?:...)` — a
capturing group inside a definition would shift the field→group-index
mapping; compile() rejects bare '(' in definitions for that reason.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# RE2-safe core library (public grok names, fresh regex bodies).
# Definitions may only contain non-capturing groups.
GROK_PATTERNS: dict = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"%{BASE10NUM}",
    "POSINT": r"\d+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"%{IPV4}",
    # dot-separated labels with a REQUIRED '.' between them: the naive
    # ((label)?\.?)+ spelling has exponentially many decompositions of a
    # plain alphanumeric run and sends Java's backtracker catastrophic
    # on long unmatched tokens (RE2/DuckDB is immune, so the oracle side
    # would never reproduce the hang). Labels cap at 63 chars — the RFC
    # 1035 limit, same cap logstash's HOSTNAME ships — so a longer
    # machine-generated label extracts as its 63-char prefix (matching
    # grok convention) rather than the whole token.
    "HOSTNAME": r"[a-zA-Z0-9][a-zA-Z0-9-]{0,62}(?:\.[a-zA-Z0-9][a-zA-Z0-9-]{0,62})*\.?",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "LOGLEVEL": (
        r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERR(?:OR)?"
        r"|CRIT(?:ICAL)?|FATAL|SEVERE|EMERG(?:ENCY)?)"
    ),
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?"
        r"(?:Z|[+-]\d{2}:?\d{2})?"
    ),
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE)",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "QS": r'"[^"]*"',
}

_SYNTAX = re.compile(
    r"%\{(?P<name>[A-Z0-9_]+)(?::(?P<field>[A-Za-z0-9_\[\]@.-]+))?"
    r"(?::(?P<type>int|long|float|double|string))?\}"
)

_CASTS = {
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": None,
}


class GrokError(ValueError):
    pass


@dataclass(frozen=True)
class CompiledGrok:
    regex: str
    # [(field, spark_cast_type_or_None)], in capture-group order
    # (group i+1 extracts fields[i])
    fields: tuple


def _has_capturing_group(body: str) -> bool:
    """True if a bare '(' (not '(?', not escaped, not inside a
    character class) appears — a regex-aware scan, since '(' is a
    literal inside [...] and after a backslash."""
    i, n, in_class = 0, len(body), False
    while i < n:
        ch = body[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            if not body.startswith("(?", i):
                return True
            # named groups are CAPTURING despite the '(?' spelling:
            # (?P<x>...) (Python) and (?<x>...) (Java; but NOT the
            # lookbehinds (?<= / (?<!) would shift group indices too
            if body.startswith("(?P<", i):
                return True
            if body.startswith("(?<", i) and not (
                body.startswith("(?<=", i) or body.startswith("(?<!", i)
            ):
                return True
        i += 1
    return False


def _expand(name: str, defs: dict, stack: tuple) -> str:
    if name not in defs:
        raise GrokError(f"unknown grok pattern %{{{name}}}")
    if name in stack:
        raise GrokError(
            f"recursive grok pattern {' -> '.join(stack + (name,))}"
        )
    body = defs[name]
    # a capturing group inside a definition would silently shift every
    # later field's group index
    if _has_capturing_group(body):
        raise GrokError(
            f"definition %{{{name}}} contains a capturing group; use (?:...)"
        )

    def sub(m) -> str:
        if m.group("field"):
            raise GrokError(
                f"definition %{{{name}}} may not bind fields (%{{...:{m.group('field')}}})"
            )
        return "(?:" + _expand(m.group("name"), defs, stack + (name,)) + ")"

    out = _SYNTAX.sub(sub, body)
    # a %{...} that _SYNTAX could not parse (bad type suffix, lowercase
    # name) would otherwise become never-matching literal regex text —
    # the same silent-literal trap _check_literal closes at top level
    m = re.search(r"(?<!\\)%\{", out)
    if m:
        raise GrokError(
            f"malformed grok token in definition %{{{name}}} at "
            f"{out[m.start():][:40]!r}"
        )
    return out


def _check_literal(segment: str) -> str:
    """Literal (non-%{...}) pattern text is kept verbatim as regex, per
    grok convention — but it must not capture (index-shift) and must
    not contain a leftover '%{' (a malformed token that _SYNTAX could
    not parse — e.g. a bad type suffix or lowercase name — would
    otherwise silently become never-matching literal text)."""
    if _has_capturing_group(segment):
        raise GrokError(
            f"capturing group in pattern literal {segment!r}; use (?:...)"
        )
    m = re.search(r"(?<!\\)%\{", segment)
    if m:
        raise GrokError(
            f"malformed grok token at {segment[m.start():][:40]!r}"
        )
    return segment


def grok_compile(pattern: str, *, extra_patterns: dict | None = None) -> CompiledGrok:
    """Compile grok syntax to (java_regex, ordered fields). Literal text
    between %{...} tokens is kept verbatim (it is already regex, per
    grok convention — escape regex metachars yourself, as in logstash);
    it may not contain capturing groups or malformed %{...} tokens."""
    defs = dict(GROK_PATTERNS)
    if extra_patterns:
        defs.update(extra_patterns)
    fields = []
    out = []
    last = 0
    for m in _SYNTAX.finditer(pattern):
        out.append(_check_literal(pattern[last : m.start()]))
        body = _expand(m.group("name"), defs, ())
        if m.group("field"):
            fields.append((m.group("field"), _CASTS[m.group("type") or "string"]))
            out.append("(" + body + ")")
        else:
            out.append("(?:" + body + ")")
        last = m.end()
    out.append(_check_literal(pattern[last:]))
    regex = "".join(out)
    names = [f for f, _ in fields]
    if len(set(names)) != len(names):
        raise GrokError(f"duplicate field names in pattern: {names}")
    try:
        re.compile(regex)
    except re.error as e:
        raise GrokError(f"compiled grok is not a valid regex: {e}") from e
    return CompiledGrok(regex=regex, fields=tuple(fields))


# multi-char delimiter for the single-pass extraction join: two NULs
# around a record separator — absent from any sane log line; rows that
# DO contain it fall back to per-field regexp_extract (correct, slower)
_DELIM = "\x00\x1e\x00"


def grok_extract(
    df: DataFrame,
    pattern: str,
    *,
    col: str = "line",
    extra_patterns: dict | None = None,
    keep_unmatched: bool = True,
) -> DataFrame:
    """Append one column per grok field. Map-side Catalyst only,
    shuffle-free; the hot path runs the compiled regex exactly TWICE
    per row regardless of field count — one `rlike` + one
    `regexp_replace` that rewrites the line to all group values joined
    by a sentinel delimiter, which a cheap `split` then fans out to the
    fields. (Per-field `regexp_extract` would be one full regex
    execution per field: the group index differs, so Catalyst's
    subexpression elimination cannot merge them. The shared
    rlike/replace/split subtrees here are identical across fields and
    ARE eliminated to one evaluation.) A row containing the sentinel
    itself falls back to per-field regexp_extract — same values, never
    corrupted. Unmatched lines yield NULL fields (or are dropped with
    keep_unmatched=False). Field names must not collide with existing
    columns (silent withColumn replacement would corrupt later
    extractions)."""
    g = grok_compile(pattern, extra_patterns=extra_patterns)
    clash = [f for f, _ in g.fields if f in df.columns]
    if clash:
        raise GrokError(
            f"grok fields {clash} collide with existing columns "
            f"(including col={col!r}); rename the fields"
        )
    c = F.col(col)
    matched = c.rlike(g.regex)
    # anchor with [\s\S] (not DOTALL '.') so embedded newlines cannot
    # leave residue around the rewritten match
    wrapped = r"^[\s\S]*?" + g.regex + r"[\s\S]*$"
    repl = _DELIM.join(f"${i + 1}" for i in range(len(g.fields)))
    parts = F.split(F.regexp_replace(c, wrapped, repl), re.escape(_DELIM), -1)
    exprs = []
    for i, (field, cast) in enumerate(g.fields):
        e = (
            F.when(~matched, F.lit(None).cast("string"))
            .when(c.contains(_DELIM), F.regexp_extract(c, g.regex, i + 1))
            .otherwise(F.element_at(parts, i + 1))
        )
        exprs.append((e.cast(cast) if cast else e).alias(field))
    out = df.select("*", *exprs)
    if not keep_unmatched:
        out = out.where(matched)
    return out


def grok_match(pattern: str, *, col: str = "line", extra_patterns: dict | None = None) -> Column:
    """Boolean rlike over the compiled grok."""
    return F.col(col).rlike(grok_compile(pattern, extra_patterns=extra_patterns).regex)
