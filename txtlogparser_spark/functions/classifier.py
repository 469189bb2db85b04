"""Linear text-quality classifier scoring (the GPT-3/CCNet/RefinedWeb
"quality classifier" stage), as a pure Catalyst expression.

The production recipe: a linear model over hashed bag-of-words
features (fastText / logistic regression trained on a
reference-vs-crawl corpus) scores every document; low scores are
dropped or down-sampled (often with Pareto-noise thresholding —
deliberately NOT reproduced here: nondeterministic selection cannot be
value-oracled; the deterministic score + threshold gate is the
composable core).

What is REAL here and transfers to a trained model unchanged:
  - hashed feature extraction (token -> bucket via md5, engine-
    portable, no vocabulary shuffle),
  - per-token weight lookup as a pure expression (a trained model
    swaps in a broadcast weight table keyed on the same buckets),
  - mean-pooled linear score + sigmoid, map-only, zero shuffle,
    whole-stage codegen.

What is a STAND-IN: the weights themselves. With no model artifact in
this environment, weight(bucket) is a deterministic hash-derived
value in [-1, 1] — same move as the multimodal codec fake: the
plumbing is real and fully testable, the learned parameters are not
pretended. Swap `hash_weight` for a `bucket -> weight` broadcast map
to deploy a real model.

Scale shape: one projection over the corpus. No joins, no shuffle, no
Python. Σ weights is a per-row fold over that row's tokens (the HOF
evaluates left-to-right deterministically), so scores are
partition-invariant and replay in DuckDB (list_aggregate order is the
list order in both engines).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_BUCKET_HEX = 6  # 24-bit feature space
_WSCALE = 1000  # weights quantized to 1/1000 steps in [-1, 1]


def hash_weight(word: Column, salt: str = "qcls-v1") -> Column:
    """Deterministic stand-in weight for a token: md5-derived integer
    in [-1000, 1000] scaled to [-1, 1]. EXACT in both engines (integer
    modulo + one division by a power-of-10 literal)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), word)), 1, _BUCKET_HEX),
        16,
        10,
    ).cast("long")
    return ((h % F.lit(2 * _WSCALE + 1)) - F.lit(_WSCALE)) / F.lit(
        float(_WSCALE)
    )


def classifier_score(
    text_col: str = "text", salt: str = "qcls-v1", bias: float = 0.0
) -> Column:
    """sigmoid(bias + mean(weight(token))) over whitespace tokens —
    double, NULL-free ('' scores sigmoid(bias): zero tokens contribute
    zero mean). The mean is an exact-integer sum of quantized weights
    divided once, so the only libm op is the final exp."""
    words = F.filter(
        F.split(F.col(text_col), "\\s+"), lambda w: w != F.lit("")
    )
    # sum the QUANTIZED integer weights exactly, divide once at the end
    iw = lambda w: (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), w)), 1, _BUCKET_HEX),
            16,
            10,
        ).cast("long")
        % F.lit(2 * _WSCALE + 1)
        - F.lit(_WSCALE)
    )
    total = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + iw(w)
    )
    n = F.size(words)
    z = F.when(n > 0, total / (F.lit(float(_WSCALE)) * n)).otherwise(
        F.lit(0.0)
    ) + F.lit(float(bias))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def classifier_quality(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    salt: str = "qcls-v1",
    bias: float = 0.0,
    out: str = "clf_score",
) -> DataFrame:
    """Append the classifier score and its keep-verdict. The
    production gate (score >= threshold, or score-proportional
    sampling via the md5 threshold trick) composes downstream."""
    s = classifier_score(text_col, salt, bias)
    return df.withColumn(out, s).withColumn(
        f"{out}_keep", F.col(out) >= F.lit(threshold)
    )


def classifier_quality_table(
    df: DataFrame,
    weights: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    bias: float = 0.0,
    out: str = "clf_score",
) -> DataFrame:
    """The TRAINED-model deployment path: score from an explicit
    `(word, weight_q)` table (weight_q = integer weight in
    [-_WSCALE, _WSCALE], the artifact a fastText/logistic training job
    exports) instead of the hash stand-in.

    Plan shape: explode words -> broadcast hash-join the weight table
    (real model vocabularies are ~10^5-10^6 rows, far under the
    broadcast threshold; out-of-vocabulary words take weight 0 via the
    left join; `word` must be unique in the table) -> one
    partial-aggregated groupBy back to the doc key. The explode stays
    within the source partition, so the partial agg collapses each
    doc's tokens map-side and the shuffle carries one (key, sum, count)
    row per doc — the regroup is the one exchange a table-driven scorer
    fundamentally needs, and it is the ONLY one: the result is the
    `(key, score, keep)` verdict table, NOT the corpus re-joined (that
    join is the caller's composition — the usual gate is a broadcast-
    free semi/anti join or a filter pushed into the next stage; forcing
    it here would add a corpus-sized doc-key join to every use).

    With `weights` = the hash_weight table over the corpus vocabulary,
    this is value-identical to classifier_quality's score/keep columns
    (test-pinned), which is exactly the swap-in guarantee the stand-in
    promises.
    """
    w = F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != F.lit(""))
    tokens = df.select(F.col(key), F.explode_outer(w).alias("_word"))
    wt = F.broadcast(
        weights.select(F.col("word").alias("_word"), F.col("weight_q"))
    )
    scored = (
        tokens.join(wt, "_word", "left")
        .groupBy(key)
        .agg(
            F.sum(F.coalesce(F.col("weight_q"), F.lit(0)))
            .cast("long")
            .alias("_total"),
            F.count(F.col("_word")).alias("_n"),
        )
    )
    z = F.when(
        F.col("_n") > 0, F.col("_total") / (F.lit(float(_WSCALE)) * F.col("_n"))
    ).otherwise(F.lit(0.0)) + F.lit(float(bias))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return scored.select(
        F.col(key),
        score.alias(out),
        (score >= F.lit(threshold)).alias(f"{out}_keep"),
    )
