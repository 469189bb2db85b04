"""C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2).

The C4 pipeline's cleaning pass is the standard first line of defense
for web-crawl text and the one line-granularity quality stage this repo
lacked (paragraph_dedup removes REPEATED units; this removes BAD ones):

  line rules  — keep a line only if it ends in terminal punctuation,
                has at least `min_words_per_line` words, does not
                mention javascript, and is not a cookie/privacy/ToS
                boilerplate line;
  page rules  — drop the whole page if it contains a curly brace (code
                markers) or the "lorem ipsum" placeholder, or if fewer
                than `min_lines` lines survive the line rules.

Scale shape: pure Catalyst higher-order functions over the split line
array — map-only, whole-stage codegen, zero shuffle, no Python. A page
is processed entirely within its row; 100 TB costs exactly one scan.
Every predicate is RE2-compatible and replays bit-exactly in DuckDB
(list_filter + regexp_matches), so cleaned-text digests are
value-oracle-checkable.

Reference parity: TxtLogParser has no notion of dropping lines — its
filters SELECT lines (FilterData.cpp) but never mutate the corpus; this
is a training-pipeline extension (SURVEY.md §2 beyond-reference ops).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# the word "javascript" anywhere on a line — C4 drops the line
_JS = "javascript"
# boilerplate phrases — C4 drops lines carrying any of them
_POLICY_RE = "terms of use|privacy policy|cookie policy|uses cookies"
# terminal punctuation a kept line must end with (C4: . ! ? ")
_TERMINAL_RE = '[.!?"]$'


def _keep_line(line: Column, min_words: int) -> Column:
    words = F.filter(
        F.split(F.trim(line), " "), lambda w: w != F.lit("")
    )
    low = F.lower(line)
    return (
        line.rlike(_TERMINAL_RE)
        & (F.size(words) >= F.lit(min_words))
        & ~low.contains(_JS)
        & ~low.rlike(_POLICY_RE)
    )


def c4_line_stats(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """Per-page C4 cleaning report: total/kept line counts, the two
    page-level drop reasons, the verdict, and the cleaned text (kept
    lines rejoined; '' when the page is dropped — a digestable value in
    both engines, unlike NULL propagation through md5)."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda l: _keep_line(l, min_words_per_line))
    low = F.lower(F.col(text_col))
    page_bad = F.col(text_col).contains("{") | low.contains("lorem ipsum")
    page_kept = ~page_bad & (F.size(kept) >= F.lit(min_lines))
    return df.select(
        key,
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        page_bad.alias("page_flagged"),
        page_kept.alias("page_kept"),
        F.when(page_kept, F.array_join(kept, "\n"))
        .otherwise(F.lit(""))
        .alias("cleaned_text"),
    )


def c4_clean(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """The pipeline stage: surviving pages only, `text_col` REPLACED by
    the cleaned text (other columns pass through untouched).

    The whole computation is row-local, so this is a projection + a
    filter — map-only, no join: an earlier draft rebuilt the keep-set
    via c4_line_stats and joined it back on the doc key, which turned a
    one-scan stage into a corpus-sized self-join (two scans + a doc-id
    shuffle of both sides) for no semantic gain."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda l: _keep_line(l, min_words_per_line))
    low = F.lower(F.col(text_col))
    page_bad = F.col(text_col).contains("{") | low.contains("lorem ipsum")
    page_kept = ~page_bad & (F.size(kept) >= F.lit(min_lines))
    return (
        df.where(page_kept)
        .withColumn(text_col, F.array_join(kept, "\n"))
    )
