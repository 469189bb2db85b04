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
    "HOSTNAME": r"(?:[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,62})?\.?)+",
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
        elif ch == "(" and not body.startswith("(?", i):
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

    return _SYNTAX.sub(sub, body)


def grok_compile(pattern: str, *, extra_patterns: dict | None = None) -> CompiledGrok:
    """Compile grok syntax to (java_regex, ordered fields). Literal text
    between %{...} tokens is kept verbatim (it is already regex, per
    grok convention — escape regex metachars yourself, as in logstash)."""
    defs = dict(GROK_PATTERNS)
    if extra_patterns:
        defs.update(extra_patterns)
    fields = []
    out = []
    last = 0
    for m in _SYNTAX.finditer(pattern):
        out.append(pattern[last : m.start()])
        body = _expand(m.group("name"), defs, ())
        if m.group("field"):
            fields.append((m.group("field"), _CASTS[m.group("type") or "string"]))
            out.append("(" + body + ")")
        else:
            out.append("(?:" + body + ")")
        last = m.end()
    out.append(pattern[last:])
    regex = "".join(out)
    names = [f for f, _ in fields]
    if len(set(names)) != len(names):
        raise GrokError(f"duplicate field names in pattern: {names}")
    try:
        re.compile(regex)
    except re.error as e:
        raise GrokError(f"compiled grok is not a valid regex: {e}") from e
    return CompiledGrok(regex=regex, fields=tuple(fields))


def grok_extract(
    df: DataFrame,
    pattern: str,
    *,
    col: str = "line",
    extra_patterns: dict | None = None,
    keep_unmatched: bool = True,
) -> DataFrame:
    """Append one column per grok field — `regexp_extract(col, regex,
    i+1)` with the declared cast. Map-side Catalyst only: the regex is
    evaluated JVM-side inside whole-stage codegen (the engine CSEs the
    shared regex match across groups); at 100 TB this is a pure scan
    stage, shuffle-free. Unmatched lines yield NULL fields (and are
    dropped entirely with keep_unmatched=False)."""
    g = grok_compile(pattern, extra_patterns=extra_patterns)
    c = F.col(col)
    out = df
    matched = c.rlike(g.regex)
    for i, (field, cast) in enumerate(g.fields):
        e = F.when(matched, F.regexp_extract(c, g.regex, i + 1))
        out = out.withColumn(field, e.cast(cast) if cast else e)
    if not keep_unmatched:
        out = out.where(matched)
    return out


def grok_match(pattern: str, *, col: str = "line", extra_patterns: dict | None = None) -> Column:
    """Boolean rlike over the compiled grok."""
    return F.col(col).rlike(grok_compile(pattern, extra_patterns=extra_patterns).regex)
