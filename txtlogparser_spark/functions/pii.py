"""Structured PII redaction for corpus curation (the Dolma recipe:
regex-scrub emails / phone numbers / IP addresses before training,
replacing each span with a typed sentinel token).

Pure map-side Catalyst: per kind one `regexp_count` + one global
`regexp_replace`, applied SEQUENTIALLY in a fixed order (IPs before
phones, so dotted quads are already sentinels when the phone pattern
— which allows '.'-separated digit groups — scans the text). Zero
shuffle at any scale. Patterns are RE2-compatible (no lookaround, no
backrefs), so the whole scrub replays in DuckDB for oracle parity
(tests/test_pii.py; DuckDB's regexp_replace needs the 'g' flag to
match Spark's always-global behavior).

Deliberately conservative: the phone pattern requires separator
structure (it must not eat years, quantities, or ids); recall on
exotic formats is traded for precision, which is the standard curation
trade — a missed phone number is recoverable by a later pass, a
corpus of false-positive sentinels is not.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# ordered: emails first (their local parts may contain digits), then
# dotted quads, then phones (which would otherwise see IP fragments)
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    # \b before the first required digit group: without it the engine
    # could start mid-way inside a longer digit run ("12345678" ->
    # "5678 ..."); RE2 has no lookbehind, so \b is the portable guard
    (
        "PHONE",
        r"(?:\+\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\b\d{3,4}[ .-]\d{3,6}(?:[ .-]\d{3,4})?\b",
    ),
)

DEFAULT_TOKEN = "|||{kind}|||"


def redact_pii(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "clean_text",
    kinds: tuple = ("EMAIL", "IP", "PHONE"),
    token_format: str = DEFAULT_TOKEN,
    with_counts: bool = True,
) -> DataFrame:
    """Append `out_col` with all requested PII kinds replaced by their
    sentinel tokens, plus (with_counts) one `n_<kind>` column per kind
    counting the redactions. Counts are taken on the text as it stands
    when that kind is processed (pipeline order above), so a dotted
    quad is counted once as an IP, never again as a phone."""
    known = dict(PII_PATTERNS)
    order = [k for k, _ in PII_PATTERNS if k in kinds]
    unknown = set(kinds) - set(known)
    if unknown:
        raise ValueError(
            f"unknown PII kinds {sorted(unknown)}; known: {[k for k, _ in PII_PATTERNS]}"
        )
    # NULL text counts as '' (0 redactions, '' output) — same contract
    # as paragraph_dedup; a bare regexp_count/replace would propagate
    # NULL counts and silently fail downstream n_<kind>=0 gates
    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for kind in order:
        pat = known[kind]
        if with_counts:
            counts.append(
                F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind.lower()}")
            )
        # Java replacement-string metachars: '$' is a group ref and '\'
        # an escape — quote them (Matcher.quoteReplacement semantics)
        # so a custom token_format like '$$${kind}' is literal
        token = token_format.format(kind=kind)
        token = token.replace("\\", "\\\\").replace("$", "\\$")
        cur = F.regexp_replace(cur, pat, token)
    return df.select("*", *counts, cur.alias(out_col))
