"""Routing: filter predicates compiled to Catalyst expressions + CASE tags.

The reference's row-survival rule is OR-semantics over enabled filters
(OutputData.cpp:308-329). We split it into two layers:

1. `survival_prefilter` — a COARSE, Catalyst-native necessary condition
   (substring containment / rlike) that Catalyst pushes toward the scan.
   It may keep rows the exact matcher later rejects (e.g. whole-word
   boundary failures) but never drops a surviving row. At 10^12-row scale
   this prunes the bulk of the data before the Python stage.
2. the exact span UDF (functions/spans.py) + `exists(filter_spans,
   s -> s.filter_id != -1)` — the precise survival decision, JVM-side over
   the UDF output.

Route tags (BASELINE.json: "Spark SQL CASE routing"): each row gets the id
of the FIRST (lowest `row`) filter that claimed a span on it, so per-route
sinks can be written with a single partitioned write instead of N scans.
Note rows can match several filters (OR-survival keeps one copy); the
boolean per-filter hit columns cover multi-membership.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, SparkSession

from txtlogparser_spark.config import FilterSpec
from txtlogparser_spark.oracle.matcher import ascii_lower


def _java_regex_ok(spark: Optional[SparkSession], pattern: str) -> bool:
    """Check a pattern also compiles as a Java regex so `rlike` can serve as
    a coarse prefilter; on failure we skip the prefilter for that filter
    (correctness unaffected — the exact UDF decides)."""
    if spark is None:
        return False
    try:
        spark._jvm.java.util.regex.Pattern.compile(pattern)  # noqa: SLF001
        return True
    except Exception:
        return False


def _necessary_condition(
    f: FilterSpec,
    text_col: Column,
    spark: Optional[SparkSession],
    dialect: str = "python",
) -> Column:
    if not f.regex:
        # substring containment is an exact necessary condition for the
        # greedy scan (whole-word only rejects candidates, never adds)
        if f.caseSensitive:
            return text_col.contains(F.lit(f.pattern))
        # ASCII case-fold (FilterData.cpp:114-117). Spark lower() is
        # Unicode-aware but cannot produce false negatives for an
        # ASCII-folded pattern, so it is a safe necessary condition.
        return F.lower(text_col).contains(F.lit(ascii_lower(f.pattern)))
    pat = f.pattern
    if f.wholeWord:
        pat = r"\b" + pat + r"\b"
    if dialect == "ecmascript":
        # rlike must see the TRANSLATED pattern: e.g. '\Z' is a literal
        # 'Z' under the emulated grammar but an anchor to Java regex —
        # prefiltering on the raw pattern could drop rows the matcher
        # claims. Post-translation, Java semantics are a superset of the
        # emulated Python semantics for every rewritten construct
        # (Java \Z ⊇ Python \Z, ASCII \w/\b/icase match, escaped braces
        # and [^\s\S]/[\s\S] classes are literal-identical), so the
        # condition stays sound-necessary. ECMA-rejected patterns claim
        # nothing — lit(True) is trivially sound for them.
        from txtlogparser_spark.functions.regex_dialect import ecma_to_python

        try:
            pat = ecma_to_python(pat)
        except ValueError:
            return F.lit(True)
    if not f.caseSensitive:
        pat = "(?i)" + pat
    if _java_regex_ok(spark, pat):
        return text_col.rlike(pat)
    return F.lit(True)


def survival_prefilter(
    filters: Sequence[FilterSpec],
    text_col: Column,
    spark: Optional[SparkSession] = None,
    dialect: str = "python",
) -> Column:
    """OR of per-filter necessary conditions; `lit(True)` when no filters
    are enabled (pass-through semantics, OutputData.cpp:323-329)."""
    enabled = [f for f in filters if f.enabled]
    if not enabled:
        return F.lit(True)
    cond = _necessary_condition(enabled[0], text_col, spark, dialect)
    for f in enabled[1:]:
        cond = cond | _necessary_condition(f, text_col, spark, dialect)
    return cond


def filter_predicate(spans_col: Column, filter_id: Optional[int] = None) -> Column:
    """Exact survival / membership over the span UDF output (JVM-side)."""
    if filter_id is None:
        return F.exists(spans_col, lambda s: s["filter_id"] != F.lit(-1))
    return F.exists(spans_col, lambda s: s["filter_id"] == F.lit(filter_id))


def filter_predicate_flat(ids_col: Column, filter_id: Optional[int] = None) -> Column:
    """Survival / membership over the FLAT f_id array (the unassembled
    sink form: one int per span, -1 = unclaimed)."""
    if filter_id is None:
        return F.exists(ids_col, lambda x: x != F.lit(-1))
    return F.exists(ids_col, lambda x: x == F.lit(filter_id))


def route_tag_flat(filters: Sequence[FilterSpec], ids_col: Column) -> Column:
    """CASE WHEN chain over the flat f_id array (see route_tag_column)."""
    enabled = sorted((f for f in filters if f.enabled), key=lambda f: f.row)

    def has_id(fid: int):
        return lambda x: x == F.lit(fid)

    expr = F.lit(-1)
    for f in reversed(enabled):
        expr = F.when(
            F.exists(ids_col, has_id(f.id)), F.lit(f.id)
        ).otherwise(expr)
    return expr


def route_tag_column(
    filters: Sequence[FilterSpec], spans_col: Column
) -> Column:
    """CASE WHEN chain: id of the first (lowest row) filter claiming a span,
    -1 when none (only possible in pass-through mode)."""
    enabled = sorted((f for f in filters if f.enabled), key=lambda f: f.row)

    def claimed_by(fid: int):
        return lambda s: s["filter_id"] == F.lit(fid)

    expr = F.lit(-1)
    for f in reversed(enabled):
        expr = F.when(
            F.exists(spans_col, claimed_by(f.id)), F.lit(f.id)
        ).otherwise(expr)
    return expr
