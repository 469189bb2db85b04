"""Token-level survival prefilter — scan-side pruning WITHOUT detokenizing.

Key scale insight: the corpus is `" ".join(vocab[t])`, so a pattern that
contains no space can only ever match INSIDE a single token's surface
form. That makes the set of candidate token ids for each filter
computable at plan time by scanning the (small) vocabulary once:

    candidates(f) = { id : necessary_literal(f) ⊆ fold(vocab[id]) }

and the survival prefilter becomes a pure-JVM, token-column predicate

    OR_f  arrays_overlap(tokens, candidates(f))

which Catalyst evaluates on the scanned `tokens` column directly — rows
are pruned BEFORE the (Python) detokenize+span stage ever sees them, and
the `text` column never materializes for dropped rows. At 10^12-sequence
scale with selective filters this is the dominant saving.

Fallbacks (correctness first — the prefilter must be a NECESSARY
condition, never dropping a surviving row):
- pattern contains a space (can match across tokens) → no token
  prefilter for that filter;
- regex with no required literal (functions.spans._required_literal)
  → no token prefilter;
- any filter without a candidate set → the whole OR is indeterminate →
  prefilter disabled (a row might survive via that filter).

Reference: the predicate semantics being approximated are
FilterData.cpp:110-238; this stage only prunes, the exact span UDF still
decides survival.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column

from txtlogparser_spark.config import FilterSpec
from txtlogparser_spark.functions.spans import _ASCII_LOWER, _required_literal


def _fold(s: str) -> str:
    return s.translate(_ASCII_LOWER)


def candidate_token_ids(
    f: FilterSpec, vocab: Sequence[str], dialect: str = "python"
) -> Optional[List[int]]:
    """Token ids whose surface form could participate in a match of
    filter `f`, or None when no sound token-level necessary condition
    exists."""
    if f.regex:
        if dialect != "python":
            # _required_literal parses with Python `re` semantics; under
            # the ecmascript emulation the same pattern can match
            # different strings (identity escapes, literal braces), so
            # no sound token-level condition is derivable here
            return None
        lit = _required_literal(f.pattern)
        if not lit:
            return None
    else:
        lit = f.pattern
    if " " in lit or not lit:
        return None
    from txtlogparser_spark.functions.detokenize import UNK

    if f.caseSensitive:
        if lit in UNK:
            return None  # out-of-range ids render as UNK; can't prune soundly
        return [i for i, w in enumerate(vocab) if lit in w]
    lit_f = _fold(lit)
    if lit_f in _fold(UNK):
        return None
    return [i for i, w in enumerate(vocab) if lit_f in _fold(w)]


def token_survival_prefilter(
    filters: Sequence[FilterSpec],
    vocab: Sequence[str],
    tokens_col: str = "tokens",
    dialect: str = "python",
) -> Optional[Column]:
    """JVM-only necessary condition for OR-survival over the tokens column,
    or None when any enabled filter lacks a sound candidate set."""
    enabled = [f for f in filters if f.enabled]
    if not enabled:
        return None
    conds = []
    for f in enabled:
        cands = candidate_token_ids(f, vocab, dialect)
        if cands is None:
            return None
        if not cands:
            # filter can never match any vocab word; it can still match
            # nothing — contributes FALSE to the OR
            conds.append(F.lit(False))
            continue
        conds.append(
            F.arrays_overlap(
                F.col(tokens_col),
                F.lit(cands).cast("array<int>"),
            )
        )
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out
