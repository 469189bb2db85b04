"""BPE tokenizer-vocabulary induction over a document corpus.

The 100-TB shape (why this is NOT a corpus-sized loop): classic BPE
training (Sennrich et al. 2016) operates on the WORD-FREQUENCY table,
not the corpus — one corpus pass aggregates (word, count), and every
merge iteration then runs over distinct words only (millions of rows
for natural language, vs trillions of corpus rows). Each iteration is:

1. pair counting: explode each word's adjacent symbol pairs weighted by
   the word count, groupBy(pair).sum — integer sums with map-side
   partial aggregation (exact, order-insensitive, skew-proof: the
   hottest pair still combines map-side);
2. argmax: orderBy(count desc, pair asc).limit(1) — TakeOrdered
   (per-partition top-1, no global sort), a 1-row driver collect;
3. merge application: a Catalyst `aggregate` fold over each word's
   symbol array (left-to-right single pass, exactly BPE's leftmost
   non-overlapping application) — map-side, zero shuffle.

Every step is deterministic: integer counts, lexicographic tie-breaks,
no RNG — the merge list is reproducible across partitionings and runs
(pinned against a pure-Python reference model in
tests/test_bpe_train.py; the driver registry's 50-slot window is full,
so the value oracle lives there).

The iterative plan grows linearly with merges; like
dedup.duplicate_components, a localCheckpoint every few iterations
truncates lineage (cadence configurable).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# end-of-word marker, appended as a separate final symbol so merges can
# learn word-final units ("ing</w>") without crossing word boundaries
EOW = "</w>"


def word_freq_table(
    docs: DataFrame, *, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """One corpus pass -> (word, n) weighted vocabulary. Whitespace
    tokenization (the repo's token_count_regex / vocab conventions);
    empty strings from repeated whitespace are dropped."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    w = F.explode(F.split(t, r"\s+", -1)).alias("word")
    return (
        docs.select(w)
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """Character symbols + EOW: 'low' -> [l, o, w, </w>]. The empty
    strings a zero-width regex split can leave at the edges are
    filtered (Java split keeps trailing empties under limit=-1)."""
    return F.concat(
        F.filter(F.split(word, "", -1), lambda s: s != ""),
        F.array(F.lit(EOW)),
    )


def _apply_merge(symbols: Column, left: str, right: str) -> Column:
    """One left-to-right pass merging adjacent (left, right) ->
    left||right — a Catalyst fold, identical to BPE's leftmost
    non-overlapping application (after a merge the scan continues AFTER
    the merged token, which the fold gets for free: the accumulated
    last element becomes the concatenation, which no longer equals
    `left` unless the data genuinely re-forms the pair)."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.expr("cast(array() as array<string>)"),
        # try_element_at: NULL (not ANSI error) on the empty initial
        # accumulator; NULL == left is NULL -> otherwise branch
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    lowercase: bool = True,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list:
    """Learn `n_merges` BPE merges from a corpus. Returns the ordered
    merge list [(rank, left, right, pair_count)] — the artifact a
    tokenizer consumes. Stops early when no pair reaches
    min_pair_count (returns fewer merges).

    Tie-break: (count DESC, left ASC, right ASC) — fully deterministic,
    no RNG; counts are exact integer sums.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    words = word_freq_table(docs, text_col=text_col, lowercase=lowercase)
    # lazy localCheckpoint (plan truncation) + persist (the releasable
    # cache layer: unpersist() frees CacheManager-registered storage,
    # whereas a checkpoint's raw RDD blocks are only GC-collected) —
    # the exact duplicate_components recipe. Materialize BEFORE any
    # older cache is dropped; superseded frames are unpersisted below.
    cur = (
        words.select(_initial_symbols(F.col("word")).alias("syms"), F.col("n"))
        .localCheckpoint(eager=False)
        .persist()
    )
    cur.count()
    prev_ckpt = cur

    merges = []
    for rank in range(n_merges):
        pair_counts = (
            cur.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p")
            .agg(F.sum("n").alias("c"))
        )
        top = (
            pair_counts.orderBy(
                F.desc("c"), F.asc(F.col("p.l")), F.asc(F.col("p.r"))
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_pair_count:
            break
        left, right, c = top[0]["p"]["l"], top[0]["p"]["r"], int(top[0]["c"])
        merges.append((rank, left, right, c))
        cur = cur.select(_apply_merge(F.col("syms"), left, right).alias("syms"), "n")
        if (rank + 1) % checkpoint_every == 0:
            # truncate the per-iteration plan growth, materialize the
            # new cache, THEN release the superseded one (dropping it
            # first would force a recompute through the truncated —
            # and possibly GC'd — old checkpoint)
            cur = cur.localCheckpoint(eager=False).persist()
            cur.count()
            prev_ckpt.unpersist()
            prev_ckpt = cur
    prev_ckpt.unpersist()
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list,
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Apply a learned merge list to a corpus: per-word character
    symbols + EOW, then the merges replayed IN RANK ORDER — map-side
    only (a chain of Catalyst folds; no shuffle, no Python). Appends
    `out_col: array<string>` of word-piece tokens in document order."""
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = F.filter(F.split(t, r"\s+", -1), lambda w: w != "")
    syms = F.transform(words, lambda w: _initial_symbols(w))

    def seg(word_syms: Column) -> Column:
        acc = word_syms
        for _, left, right, _c in merges:
            acc = _apply_merge(acc, left, right)
        return acc

    return df.withColumn(out_col, F.flatten(F.transform(syms, seg)))


def bpe_segment_pandas(
    df: DataFrame,
    merges: list,
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Arrow-vectorized segmentation for REAL merge lists: the Catalyst
    fold chain in `bpe_segment` nests one `aggregate` per merge —
    fine for tens of merges, but a production tokenizer has thousands,
    which blows codegen into interpreted mode. This path ships the
    merge table once per executor and applies it per Arrow batch with
    the standard rank-priority algorithm (repeatedly merge the
    lowest-rank adjacent pair — equivalent to replaying merges in rank
    order, because ranks are globally consistent). Still map-only:
    zero shuffle, one mapInArrow-style pass; parity with the Catalyst
    path is pinned in tests."""
    import pandas as pd  # noqa: F401 (mapInPandas batch type)

    rank = {(l, r): i for i, l, r, _c in merges}
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_schema}, `{out_col}` array<string>"

    def _seg_word(word: str) -> list:
        syms = list(word) + [EOW]
        # rank-priority merging: at each step merge the lowest-rank
        # adjacent pair present; identical result to rank-order replay
        while len(syms) > 1:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                rk = rank.get((syms[i], syms[i + 1]))
                if rk is not None and (best is None or rk < best):
                    best, best_i = rk, i
            if best is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    import re as _re

    # Java regex \s is ASCII-only ([ \t\n\x0B\f\r]); Python str.split()
    # splits on Unicode whitespace ( , 　, ...) — parity with
    # the Catalyst path requires the Java class
    java_ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    def _run(batches):
        for pdf in batches:
            texts = pdf[text_col]
            toks = []
            for t in texts:
                if t is None:
                    # Catalyst path: split(NULL) propagates to NULL
                    toks.append(None)
                    continue
                t = t.lower() if lowercase else t
                row = []
                for w in java_ws.split(t):
                    if w:
                        row.extend(_seg_word(w))
                toks.append(row)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return df.mapInPandas(_run, schema)
