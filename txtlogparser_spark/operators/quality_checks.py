"""Declarative data-quality gates (Deequ-style, minimal core).

A training pipeline validates a table BEFORE burning compute on it:
key non-null/unique, values in range, categories in vocabulary, row
counts sane. Each constraint here compiles to aggregate expressions so
a whole check suite is ONE map-side-combined pass over the table — no
per-check scans, no driver loops; the result is a small (check,
violations, passed) report that a gate task can assert on.

All constraints report `violations` (0 = clean) so failing checks
quantify the damage, not just flag it.

Reference parity: none (TxtLogParser trusts its input file); this is a
training-pipeline extension, same family as the public Deequ /
dbt-tests / Great Expectations constraint sets.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class Check:
    name: str
    violations: Column  # long aggregate: number of offending rows


def not_null(col: str) -> Check:
    return Check(
        f"not_null({col})",
        F.sum(F.col(col).isNull().cast("long")),
    )


def unique(col: str) -> Check:
    """Violations = rows beyond the first of each duplicated value
    (count - distinct count); nulls all count as violations (pair with
    not_null). Cost note: exact count_distinct adds one shuffle keyed on
    the column (the standard two-phase distinct-agg plan) — the only
    check here that isn't a pure map-side fold. At 10^12 rows either
    accept that shuffle (it's the uniqueness check's information-
    theoretic price) or swap in approx_count_distinct with a tolerance."""
    return Check(
        f"unique({col})",
        F.count(F.lit(1)) - F.count_distinct(F.col(col)),
    )


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"in_range({col},{lo},{hi})",
        F.sum(
            (~F.col(col).between(F.lit(lo), F.lit(hi)))
            .cast("long")
        ),
    )


def accepted_values(col: str, values: Sequence) -> Check:
    vals = list(values)
    return Check(
        f"accepted_values({col})",
        F.sum((~F.col(col).isin(*vals)).cast("long")),
    )


def matches_regex(col: str, pattern: str) -> Check:
    return Check(
        f"matches_regex({col})",
        F.sum((~F.col(col).rlike(pattern)).cast("long")),
    )


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregate pass; returns
    (check, violations, passed) rows via stack() over the 1-row result
    (the final exchange carries one partial row per partition — the
    benign scalar-agg funnel, see tools/explain_audit.py)."""
    aggs = [
        F.coalesce(c.violations, F.lit(0)).cast("long").alias(f"_c{i}")
        for i, c in enumerate(checks)
    ]
    row = df.agg(*aggs)
    # literal-column structs, NOT a selectExpr string: check names carry
    # user regexes/quotes/backslashes verbatim, so nothing may round-trip
    # through the SQL parser
    pairs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.col(f"_c{i}").alias("violations"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select("p.check", "p.violations")
        .select(
            "check",
            "violations",
            (F.col("violations") == 0).alias("passed"),
        )
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    thresholds: list,
) -> DataFrame:
    """Filter-threshold calibration report: for each candidate
    threshold t, how many rows a `score >= t` gate keeps and the keep
    rate — the one-pass sweep run before fixing a quality-classifier
    cutoff (the fastText/CCNet "what does 0.5 cost me" question).

    ONE scalar aggregate computes the total plus every threshold's
    keep count (T+1 exact integers in a single row — map-side
    partials, no per-threshold pass), then a stack() unpivot emits the
    (threshold, n_keep, keep_rate) rows. keep_rate is a single IEEE
    division rounded at the end; an empty input yields rate NULL
    (no rows to rate) with n_keep 0."""
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    ts = [float(t) for t in thresholds]
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("_tot"),
        *[
            F.sum((F.col(score_col) >= F.lit(t)).cast("long"))
            .alias(f"_k{i}")
            for i, t in enumerate(ts)
        ],
    )
    pairs: list = []
    for i, t in enumerate(ts):
        pairs += [F.lit(t), F.coalesce(F.col(f"_k{i}"), F.lit(0))]
    return agg.select(
        F.col("_tot"),
        F.stack(F.lit(len(ts)), *pairs).alias("threshold", "n_keep"),
    ).select(
        "threshold",
        F.col("n_keep").cast("long").alias("n_keep"),
        F.when(
            F.col("_tot") > 0, F.round(F.col("n_keep") / F.col("_tot"), 6)
        ).alias("keep_rate"),
    )
