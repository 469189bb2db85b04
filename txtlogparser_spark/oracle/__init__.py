"""Pure-Python oracle reproducing the reference's semantics exactly.

No Spark here: these functions operate on plain Python lists so they can be
pinned by hand-computed micro-cases and then used as the expected-value
generator for the Spark engine's end-to-end tests (SURVEY.md §5).
"""

from txtlogparser_spark.oracle.matcher import (  # noqa: F401
    Span,
    ascii_lower,
    match_non_regex,
    match_regex,
    match_positions,
    apply_matcher_to_segment,
    scrub_line,
)
from txtlogparser_spark.oracle.pipeline import (  # noqa: F401
    LineRec,
    OracleResult,
    run_pipeline,
    window_slice,
    format_line_prefix,
    next_match,
    prev_match,
)
