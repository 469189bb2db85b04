"""DSIR-style data selection via hashed n-gram importance resampling.

The published recipe (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"): hash each document's unigrams +
bigrams into B buckets, fit two bag-of-hashed-ngrams unigram models —
one on a TARGET corpus (the distribution you want more of), one on the
RAW corpus — and weight every raw document by its log importance ratio
    w(d) = Σ_grams [ log p_target(bucket(g)) - log p_raw(bucket(g)) ].
Selection is Gumbel top-n over w/τ + g (sampling without replacement
proportional to exp(w/τ)); here the Gumbel noise is derived from an
md5 hash of the doc id, so the selected set is deterministic,
partitioning-invariant, and replayable in DuckDB.

Scale shape — everything heavy is map-only:
  - feature hashing (md5 bucket per gram) and per-doc scoring are
    pure Catalyst projections; zero shuffle, zero Python.
  - the model is two B-row bucket-count dims (one map-side-combined
    groupBy each — the enrich-dim class, B ≤ ~10^4), driver-collected
    once and folded into a LITERAL log-ratio array, so the scoring
    pass is join-free.
  - per-doc weights are EXACT integer sums of fixed-point quantized
    log-ratios (floor(r·2^24 + 0.5), the kmeans_refine trick) —
    order-insensitive, bit-identical across partitionings AND engines
    (a float Σ over grams would be shuffle-order-nondeterministic).
  - top-n selection is orderBy+limit (TakeOrderedAndProject:
    per-partition heads + an n-row merge — never a single-partition
    sort). For resampling a constant FRACTION of the corpus at 100 TB
    (n too big to merge on the driver), keep the same key and switch
    the head to a hash_sample-style threshold on exp-key mass instead;
    the per-doc arithmetic is unchanged.

Reference parity: TxtLogParser has no data-selection concept —
training-pipeline extension (SURVEY.md §2 beyond-reference ops).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

FP_SCALE = 16777216.0  # 2^24 fixed-point quantization of log-ratios
_GUMBEL_DEN = 281474976710657.0  # 2^48 + 1: u = (h+1)/den ∈ (0,1)


def _grams(words: Column) -> Column:
    """unigrams ++ adjacent bigrams ('a b'). Bigrams come from zip_with
    over two slices — NOT element_at(words, i) inside a lambda:
    Catalyst does not CSE a COMPUTED `words` expression inside
    higher-order-function lambdas (the operators/lm.py lesson), so the
    element_at form re-evaluates the full split+filter per element —
    O(len²) per document (measured: the 64-bucket model pass dropped
    9.8s → 1.3s at 5k docs after this rewrite). slice handles the
    short-doc edges itself: n<2 yields two empty slices → no bigrams."""
    n = F.size(words)
    ln = F.greatest(n - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(words, 1, ln),
        F.slice(words, 2, ln),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(words, bi)


def gram_buckets(
    text_col: str,
    n_buckets: int,
    seed: str,
    lowercase: bool = True,
) -> Column:
    """array<int> of hashed-gram bucket ids for a document — the
    feature vector, computed map-side."""
    from txtlogparser_spark.functions.text import doc_words

    return F.transform(
        _grams(doc_words(text_col, lowercase)),
        lambda g: F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(seed + ":"), g)), 1, 7),
                16,
                10,
            ).cast("int"),
            F.lit(n_buckets),
        ),
    )


def bucket_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = 64,
    seed: str = "dsir-v1",
    lowercase: bool = True,
) -> DataFrame:
    """(bucket, n) hashed-gram occurrence counts — a B-row dim via one
    explode + map-side-combined groupBy."""
    return (
        df.select(
            F.explode(
                gram_buckets(text_col, n_buckets, seed, lowercase)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def logratio_fp(
    target_counts: dict,
    raw_counts: dict,
    n_buckets: int,
    smoothing: float = 0.5,
) -> list:
    """Per-bucket fixed-point log importance ratios (driver-side over
    the two B-row dims): floor((ln p_t(b) - ln p_r(b)) · 2^24 + 0.5)
    under add-λ smoothing. Exact ints from here on."""
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0")
    ct_tot = sum(target_counts.values())
    cr_tot = sum(raw_counts.values())
    lam = float(smoothing)
    out = []
    for b in range(n_buckets):
        r = math.log(
            (target_counts.get(b, 0) + lam) / (ct_tot + lam * n_buckets)
        ) - math.log(
            (raw_counts.get(b, 0) + lam) / (cr_tot + lam * n_buckets)
        )
        out.append(int(math.floor(r * FP_SCALE + 0.5)))
    return out


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    smoothing: float = 0.5,
    seed: str = "dsir-v1",
    lowercase: bool = True,
) -> DataFrame:
    """(id, weight_fp, weight): per-raw-doc importance weight. Two
    B-row dim collects build the literal ratio array; scoring is one
    map-only projection (exact integer fold over the doc's gram
    buckets)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if smoothing <= 0:
        # fail BEFORE the two corpus-scan bucket_counts jobs, not after
        raise ValueError("smoothing must be > 0")
    tc = {
        r["bucket"]: int(r["n"])
        for r in bucket_counts(
            target,
            text_col=text_col,
            n_buckets=n_buckets,
            seed=seed,
            lowercase=lowercase,
        ).collect()
    }
    rc = {
        r["bucket"]: int(r["n"])
        for r in bucket_counts(
            raw,
            text_col=text_col,
            n_buckets=n_buckets,
            seed=seed,
            lowercase=lowercase,
        ).collect()
    }
    qr = logratio_fp(tc, rc, n_buckets, smoothing)
    wfp = weight_fp_column(
        qr, text_col=text_col, seed=seed, lowercase=lowercase
    )
    return raw.select(
        F.col(id_col).alias("doc_id"),
        wfp.alias("weight_fp"),
    ).withColumn(
        "weight", F.round(F.col("weight_fp") / F.lit(FP_SCALE), 6)
    )


def weight_fp_column(
    qr: list,
    *,
    text_col: str = "text",
    seed: str = "dsir-v1",
    lowercase: bool = True,
) -> Column:
    """The fixed-point importance-weight expression for a TRAINED model
    (the per-bucket ratio list from logratio_fp): an exact integer fold
    over the doc's gram buckets — a pure map column, so the same
    expression scores a batch corpus or a Structured Streaming source
    of arriving documents unchanged (stream==batch pinned in
    tests/test_streaming_curation.py)."""
    n_buckets = len(qr)
    qr_arr = F.array(*[F.lit(int(q)).cast("long") for q in qr])
    buckets = gram_buckets(text_col, n_buckets, seed, lowercase)
    # coalesce: a NULL text makes the gram array NULL and the fold NULL
    # — score it 0 like an empty doc (matches the DuckDB oracle's
    # LEFT JOIN + COALESCE and keeps the Gumbel key selectable)
    return F.coalesce(
        F.aggregate(
            buckets,
            F.lit(0).cast("long"),
            lambda acc, bx: acc + F.element_at(qr_arr, bx + 1),
        ),
        F.lit(0).cast("long"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    smoothing: float = 0.5,
    temperature: float = 1.0,
    seed: str = "dsir-v1",
    lowercase: bool = True,
) -> DataFrame:
    """Gumbel top-n selection: key = weight/τ + Gumbel(md5(doc_id)).
    Returns (doc_id, weight, gkey) for the n selected docs, ranked by
    the raw (unrounded) key with doc_id tie-break — deterministic,
    partitioning-invariant, DuckDB-replayable."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    w = dsir_weights(
        raw,
        target,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        smoothing=smoothing,
        seed=seed,
        lowercase=lowercase,
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("gum:" + seed + ":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(_GUMBEL_DEN)
    gk = -F.log(-F.log(u))
    key = (
        F.col("weight_fp").cast("double")
        / F.lit(FP_SCALE)
        / F.lit(float(temperature))
        + gk
    )
    return (
        w.withColumn("_key", key)
        .orderBy(F.desc("_key"), F.asc("doc_id"))
        .limit(n)
        .select("doc_id", "weight", F.round("_key", 6).alias("gkey"))
    )
