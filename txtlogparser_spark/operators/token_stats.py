"""Token-id frequency / coverage statistics over pre-tokenized corpora.

The north-star input is tokens:array<int>; the first report any
tokenizer-health or mixture audit asks for is per-group (source,
language, shard) id-frequency structure: how many token occurrences,
how many DISTINCT ids, and what fraction of the total token mass the
top-k most frequent ids carry (the "coverage curve" — a tokenizer whose
top-100 ids carry 90% of a source's mass is compressing badly or the
source is degenerate boilerplate).

Scale shape (the quota_sample / quantile_buckets lesson):
  - `token_frequency` is ONE explode + map-side-combined groupBy on
    (group, token) — the result is a DIM bounded by |vocab| × |groups|
    rows, never corpus-sized; skew-proof (a 10^9-copy token partially
    aggregates per map partition).
  - `token_coverage` runs its rank window over THAT DIM only — the
    fact table is never group-sorted and no single task ever receives
    a whole group of raw rows.
  - All counts are exact integers; the two fractions round(6) at the
    very end, so every value replays bit-identically in DuckDB.

Determinism: ties on count rank by (count DESC, token ASC) — a total
order, so top-k sets are engine- and partitioning-invariant.

Reference parity: TxtLogParser has no token-statistics concept;
training-pipeline extension (SURVEY.md §2 beyond-reference ops).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def token_frequency(
    df: DataFrame,
    tokens_col: str = "tokens",
    group_col: str | None = None,
) -> DataFrame:
    """(group?, token, n) exact occurrence counts — the dim every
    downstream coverage/top-k report runs over. group_col=None counts
    corpus-wide."""
    cols = ([F.col(group_col)] if group_col else []) + [
        F.explode(F.col(tokens_col)).alias("token")
    ]
    keys = ([group_col] if group_col else []) + ["token"]
    return (
        df.select(*cols)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def token_coverage(
    df: DataFrame,
    tokens_col: str = "tokens",
    group_col: str = "source",
    k: int = 100,
) -> DataFrame:
    """Per-group tokenizer-coverage report:

      n_tokens    — total token occurrences in the group
      n_distinct  — distinct token ids
      topk_mass   — occurrences carried by the k most frequent ids
                    (ties broken token-ascending; groups with fewer
                    than k distinct ids cover everything)
      coverage    — round(topk_mass / n_tokens, 6)
      top_token   — the single most frequent id (deterministic witness)

    The window ranks the (group, token, n) dim — |vocab|-bounded — not
    the corpus; one broadcast-sized aggregate result per group."""
    if k < 1:
        raise ValueError("k must be >= 1")
    freq = token_frequency(df, tokens_col, group_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    ranked = freq.withColumn("_rk", F.row_number().over(w))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("_rk") <= k, F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("topk_mass"),
            F.min(F.when(F.col("_rk") == 1, F.col("token"))).alias("top_token"),
        )
        .withColumn(
            "coverage",
            F.round(F.col("topk_mass") / F.col("n_tokens"), 6),
        )
    )


def token_drift_table(
    a: DataFrame, b: DataFrame, tokens_col: str = "tokens"
) -> DataFrame:
    """(token, n_a, n_b) exact occurrence counts of two corpus slices,
    full-outer aligned on the union vocabulary (zeros filled) — the
    vocab-bounded dim every drift metric runs over. NULL token ids are
    excluded on both sides (a NULL id is missing data, and an equi-join
    would mis-align it into two one-sided rows). Two map-side-combined
    groupBys + one |vocab|-bounded equi-join; the corpora themselves
    are never joined or co-shuffled."""
    fa = (
        token_frequency(a, tokens_col)
        .where(F.col("token").isNotNull())
        .withColumnRenamed("n", "n_a")
    )
    fb = (
        token_frequency(b, tokens_col)
        .where(F.col("token").isNotNull())
        .withColumnRenamed("n", "n_b")
    )
    return fa.join(fb, "token", "full_outer").fillna(0, ["n_a", "n_b"])


def _smoothed_pq(lam):
    """Smoothed probability columns over the drift table + inlined
    totals: single IEEE divisions of exact integers — bit-identical
    across engines and partitionings."""
    p = (F.col("n_a") + lam) / (F.col("_na_tot") + lam * F.col("_v"))
    q = (F.col("n_b") + lam) / (F.col("_nb_tot") + lam * F.col("_v"))
    return p, q


def _drift_base(a, b, tokens_col, smoothing):
    """Persisted drift table + its 1-row totals (driver-collected: a
    3-scalar aggregate over the vocab-bounded dim — the sanctioned
    scalar-collect shape). Persisting the dim means the two corpus
    frequency passes run ONCE even though both the totals job and the
    metric job read the table. Caller must unpersist (the persist is
    rolled back here if the totals job itself fails)."""
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (KL finiteness)")
    tbl = token_drift_table(a, b, tokens_col).persist()
    try:
        tot = tbl.agg(
            F.sum("n_a").cast("long").alias("na"),
            F.sum("n_b").cast("long").alias("nb"),
            F.count(F.lit(1)).cast("long").alias("v"),
        ).collect()[0]
    except BaseException:
        tbl.unpersist()
        raise
    withtot = tbl.select(
        "token",
        "n_a",
        "n_b",
        F.lit(int(tot["na"] or 0)).alias("_na_tot"),
        F.lit(int(tot["nb"] or 0)).alias("_nb_tot"),
        F.lit(int(tot["v"] or 0)).alias("_v"),
    )
    return tbl, withtot


def _summary_frame(withtot, lam):
    """Lazy 1-row summary over the with-totals dim. Aggregates over an
    EMPTY dim (both corpora empty) coalesce to exact zeros — max/sum of
    zero rows are NULL otherwise."""
    p, q = _smoothed_pq(lam)
    m = (p + q) / F.lit(2.0)
    per = withtot.select(
        "_na_tot",
        "_nb_tot",
        "_v",
        (F.col("n_a") > 0).cast("long").alias("_ia"),
        (F.col("n_b") > 0).cast("long").alias("_ib"),
        (p * F.log(p / q)).alias("_kl_ab"),
        (q * F.log(q / p)).alias("_kl_ba"),
        (F.lit(0.5) * (p * F.log(p / m) + q * F.log(q / m))).alias("_js"),
        F.abs(p - q).alias("_l1"),
    )
    zero = F.lit(0).cast("long")
    return per.groupBy().agg(
        F.coalesce(F.max("_na_tot").cast("long"), zero).alias("n_tok_a"),
        F.coalesce(F.max("_nb_tot").cast("long"), zero).alias("n_tok_b"),
        F.coalesce(F.sum("_ia").cast("long"), zero).alias("vocab_a"),
        F.coalesce(F.sum("_ib").cast("long"), zero).alias("vocab_b"),
        F.coalesce(F.max("_v").cast("long"), zero).alias("vocab_union"),
        F.coalesce(F.round(F.sum("_kl_ab"), 6), F.lit(0.0)).alias("kl_ab"),
        F.coalesce(F.round(F.sum("_kl_ba"), 6), F.lit(0.0)).alias("kl_ba"),
        F.coalesce(F.round(F.sum("_js"), 6), F.lit(0.0)).alias("js_div"),
        F.coalesce(F.round(F.sum("_l1"), 6), F.lit(0.0)).alias("l1_dist"),
    )


def _top_frame(withtot, lam, k):
    """Lazy top-k drift contributors over the with-totals dim:
    TakeOrdered (per-partition top-k, no global sort), ties ranked
    token-ascending."""
    p, q = _smoothed_pq(lam)
    return (
        withtot.select(
            "token",
            F.col("n_a"),
            F.col("n_b"),
            F.round(F.abs(p - q), 9).alias("abs_diff"),
            F.abs(p - q).alias("_raw_diff"),
        )
        .orderBy(F.desc("_raw_diff"), F.asc("token"))
        .limit(k)
        .drop("_raw_diff")
    )


def token_drift_report(
    a: DataFrame,
    b: DataFrame,
    tokens_col: str = "tokens",
    k: int = 10,
    smoothing: float = 0.5,
) -> tuple:
    """(summary_df, top_df) from ONE shared persisted drift table —
    the shape to use when both reports are wanted (e.g. the driver
    suite): two corpus frequency passes total, one cache fill, one
    unpersist. See token_drift_summary / token_drift_top for the
    individual report semantics; both are computed eagerly here."""
    if k < 1:
        raise ValueError("k must be >= 1")
    tbl, withtot = _drift_base(a, b, tokens_col, smoothing)
    try:
        lam = F.lit(float(smoothing))
        s = _summary_frame(withtot, lam)
        t = _top_frame(withtot, lam, k)
        s_rows, s_schema = s.collect(), s.schema
        t_rows, t_schema = t.collect(), t.schema
    finally:
        tbl.unpersist()
    spark = a.sparkSession
    return (
        spark.createDataFrame(s_rows, s_schema),
        spark.createDataFrame(t_rows, t_schema),
    )


def token_drift_summary(
    a: DataFrame,
    b: DataFrame,
    tokens_col: str = "tokens",
    smoothing: float = 0.5,
) -> DataFrame:
    """One-row token-distribution drift report between two corpus
    slices (train vs eval split, epoch vs epoch, source vs source —
    the mixture-shift / contamination-shift audit):

      n_tok_a/b    — total token occurrences per slice (exact)
      vocab_a/b    — distinct ids per slice; vocab_union over both
      kl_ab, kl_ba — KL(p||q), KL(q||p) in nats over add-lambda
                     smoothed distributions (lambda=smoothing over the
                     union vocab, so both p and q sum to exactly 1 and
                     KL stays finite on one-sided tokens)
      js_div       — Jensen-Shannon divergence (symmetric, bounded
                     by ln 2)
      l1_dist      — total variation x2: sum |p_i - q_i|

    All inputs to the floating stage are exact integer counts; the
    smoothed p/q are single IEEE divisions, so everything up to the
    final log-sums replays bit-identically in DuckDB and the sums
    agree far beyond the round(6) published precision. Two empty
    corpora report exact zeros (not NULLs).

    Scale shape: the corpus cost is exactly the two map-side-combined
    frequency passes — the |vocab|-bounded drift table is persisted,
    its totals driver-collected (3 scalars) and inlined as literals,
    and the metric aggregate runs over the cached dim, so neither
    corpus is ever read twice or co-shuffled. Computed EAGERLY (two
    small jobs over the cached dim); returns a 1-row DataFrame. Use
    token_drift_report when the top-k table is wanted too."""
    tbl, withtot = _drift_base(a, b, tokens_col, smoothing)
    try:
        out = _summary_frame(withtot, F.lit(float(smoothing)))
        rows, schema = out.collect(), out.schema
    finally:
        tbl.unpersist()
    return a.sparkSession.createDataFrame(rows, schema)


def token_drift_top(
    a: DataFrame,
    b: DataFrame,
    tokens_col: str = "tokens",
    k: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Top-k drift contributors: the tokens with the largest smoothed
    |p_a - p_b| (same add-lambda smoothing as token_drift_summary).
    Deterministic across engines and partitionings: p/q are single
    IEEE divisions of exact integers (bit-identical everywhere) and
    ties rank token-ascending. TakeOrdered over the persisted
    vocab-bounded drift table — per-partition top-k, no global sort;
    computed eagerly, returns a k-row DataFrame. Use
    token_drift_report when the summary is wanted too."""
    if k < 1:
        raise ValueError("k must be >= 1")
    tbl, withtot = _drift_base(a, b, tokens_col, smoothing)
    try:
        out = _top_frame(withtot, F.lit(float(smoothing)), k)
        rows, schema = out.collect(), out.schema
    finally:
        tbl.unpersist()
    return a.sparkSession.createDataFrame(rows, schema)


def token_entropy(
    tokens_col: str = "tokens", out_decimals: int = 6
) -> "F.Column":
    """Per-document Shannon entropy (nats) of the token-id
    distribution — the diversity/degeneracy quality signal (near-0 =
    the doc is one token repeated; ln(n_distinct) = perfectly uniform).

    H = ln(n) - (1/n) * sum_i c_i ln c_i over the doc's own id
    histogram — computed MAP-ONLY: array_sort + one Catalyst aggregate
    fold accumulating run lengths (struct(last, run, s)), with the
    finish lambda flushing the final run. No explode, no shuffle, no
    Python; the corpus-wide (doc_id, token) groupBy a naive version
    needs never happens. Empty/NULL arrays -> NULL. Counts are exact
    integers; ln and the final division are the only float ops, so the
    value replays in DuckDB (group-by replay) within round(6)."""
    toks = F.array_sort(F.col(tokens_col))
    n = F.size(F.col(tokens_col))
    zero_struct = F.struct(
        F.lit(None).cast("bigint").alias("last"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("s"),
    )
    folded = F.aggregate(
        toks,
        zero_struct,
        lambda acc, t: F.when(
            acc["last"].eqNullSafe(t.cast("bigint")),
            F.struct(
                acc["last"].alias("last"),
                (acc["run"] + 1).alias("run"),
                acc["s"].alias("s"),
            ),
        ).otherwise(
            F.struct(
                t.cast("bigint").alias("last"),
                F.lit(1).cast("long").alias("run"),
                (
                    acc["s"]
                    + F.when(
                        acc["run"] > 0,
                        acc["run"] * F.log(acc["run"].cast("double")),
                    ).otherwise(F.lit(0.0))
                ).alias("s"),
            )
        ),
        # flush the final run
        lambda acc: acc["s"]
        + F.when(
            acc["run"] > 0, acc["run"] * F.log(acc["run"].cast("double"))
        ).otherwise(F.lit(0.0)),
    )
    h = F.log(n.cast("double")) - folded / n.cast("double")
    return F.when(n > 0, F.round(h, out_decimals)).otherwise(
        F.lit(None).cast("double")
    )


def zipf_slope(
    df: DataFrame,
    tokens_col: str = "tokens",
    group_col: str = "source",
) -> DataFrame:
    """Per-group Zipf rank-frequency fit: OLS slope and r2 of
    y = ln(count) on x = ln(rank) over the group's token-frequency
    dim (natural-language sources sit near slope -1; degenerate or
    boilerplate-heavy sources flatten, random-id streams steepen —
    the distribution-shape complement of token_coverage's mass
    fraction).

      n_distinct — points in the fit (distinct ids)
      slope      — (k*Sxy - Sx*Sy) / (k*Sxx - Sx^2), round(6)
      r2         — (k*Sxy - Sx*Sy)^2 / ((k*Sxx - Sx^2)(k*Syy - Sy^2)),
                   round(6); NULL when a variance term is 0 (a
                   single-token group, or all counts equal)

    Ranks are deterministic (count DESC, token ASC — the
    token_coverage total order), x/y come from exact integer
    counts/ranks, and the sums are written out explicitly so DuckDB
    replays the identical formula (not its internal regr_* forms).

    Scale shape: the rank window and the fit consume the map-side-
    combined (group, token, n) dim — |vocab|-bounded, never the
    corpus (same plan shape as token_coverage)."""
    freq = token_frequency(df, tokens_col, group_col).where(
        F.col("token").isNotNull()
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    pts = freq.select(
        group_col,
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    agg = pts.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        group_col,
        F.col("k").cast("long").alias("n_distinct"),
        F.when(dxx != 0, F.round(num / dxx, 6)).alias("slope"),
        F.when(
            (dxx != 0) & (dyy != 0),
            F.round(num * num / (dxx * dyy), 6),
        ).alias("r2"),
    )


def pair_frequency(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """(a, b, c) exact occurrence counts of ADJACENT token-id pairs —
    the bigram dim collocation mining runs over. Same scale shape as
    token_frequency: one map-side transform builds each document's
    pair array (guarded for <2-token docs the way operators/lm.py
    guards empty word arrays — sequence(1, 0) would descend), ONE
    explode feeds a map-side-combined groupBy, and the result is a dim
    bounded by the number of DISTINCT adjacent pairs, never the
    corpus. NULL ids never form pairs (a NULL id is missing data)."""
    toks = F.col(tokens_col)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("a"),
            F.element_at(toks, i + 1).alias("b"),
        ),
    )
    guarded = F.when(F.size(toks) >= 2, pairs).otherwise(
        F.array().cast("array<struct<a:int,b:int>>")
    )
    return (
        df.select(F.explode(guarded).alias("_pr"))
        .select("_pr.a", "_pr.b")
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def pmi_collocations(
    df: DataFrame,
    tokens_col: str = "tokens",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over adjacent
    token-id pairs (the classic Church-Hanks association measure — the
    collocation/phrase-mining pass a tokenizer- or corpus-audit runs to
    find ids that co-occur far above chance):

      pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) )
               = ln(c_ab) + 2·ln(N_uni) - ln(N_bi) - ln(c_a) - ln(c_b)

    written as explicit logs of EXACT integer counts, so both engines
    compute bit-identical doubles and agree on the ranking, not just
    the rounded display value. `min_count` drops rare pairs (PMI's
    known low-frequency pathology: a 1-occurrence pair of two hapaxes
    maximizes raw PMI).

    Scale shape: two map-side-combined corpus passes build the pair
    and unigram dims; totals are driver-collected scalars over those
    dims (the _drift_base convention) and inlined as literals so the
    scoring job is join-free above the two vocab-bounded dim joins.
    Top-k is orderBy+limit — TakeOrderedAndProject, per-partition
    heads + a k-row merge, never a single-partition sort. Ties break
    (pmi DESC, a ASC, b ASC) — a total order, partitioning-invariant.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    bi = pair_frequency(df, tokens_col).persist()
    try:
        uni = (
            token_frequency(df, tokens_col)
            .where(F.col("token").isNotNull())
            .persist()
        )
        try:
            n_bi = int(
                bi.agg(F.sum("c").cast("long")).collect()[0][0] or 0
            )
            n_uni = int(
                uni.agg(F.sum("n").cast("long")).collect()[0][0] or 0
            )
            ua = uni.select(
                F.col("token").alias("a"), F.col("n").alias("c_a")
            )
            ub = uni.select(
                F.col("token").alias("b"), F.col("n").alias("c_b")
            )
            scored = (
                bi.where(F.col("c") >= min_count)
                .join(ua, "a")
                .join(ub, "b")
                .select(
                    "a",
                    "b",
                    F.col("c").alias("c_ab"),
                    (
                        F.log(F.col("c").cast("double"))
                        + F.lit(2.0) * F.log(F.lit(float(n_uni)))
                        - F.log(F.lit(float(n_bi)))
                        - F.log(F.col("c_a").cast("double"))
                        - F.log(F.col("c_b").cast("double"))
                    ).alias("_pmi"),
                )
            )
            out = (
                scored.orderBy(
                    F.desc("_pmi"), F.asc("a"), F.asc("b")
                )
                .limit(k)
                .select("a", "b", "c_ab", F.round("_pmi", 6).alias("pmi"))
            )
            # materialize before unpersist: limit(k) is k rows
            rows = out.collect()
            spark = df.sparkSession
            return spark.createDataFrame(
                rows, "a int, b int, c_ab long, pmi double"
            )
        finally:
            uni.unpersist()
    finally:
        bi.unpersist()


def vocab_overlap(
    df: DataFrame,
    tokens_col: str = "tokens",
    group_col: str = "source",
) -> DataFrame:
    """Pairwise vocabulary overlap between groups — the cross-source
    contamination/redundancy audit (two mirrors of the same site, or a
    source that is a filtered copy of another, show up as a Jaccard
    near 1 long before document-level dedup finds the pairs):

      (src_a, src_b, n_common, n_a, n_b, jaccard)   for src_a < src_b

    with jaccard = |Va ∩ Vb| / |Va ∪ Vb| over DISTINCT token ids.

    Scale shape: the distinct (group, token) VOCAB dim is one
    map-side-combined aggregate (a 10^9-copy token collapses per map
    partition before the shuffle); the pair counts come from the dim's
    self-equi-join on token — |vocab|·G²-bounded, never corpus-sized —
    and the two size lookups are broadcast dim joins. All counts exact
    integers; jaccard is one IEEE division rounded at the end."""
    vocab = (
        df.select(
            F.col(group_col).alias("_g"),
            F.explode(F.col(tokens_col)).alias("token"),
        )
        .where(F.col("token").isNotNull())
        .distinct()
    )
    sizes = vocab.groupBy("_g").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    a = vocab.select(F.col("_g").alias("src_a"), "token")
    b = vocab.select(F.col("_g").alias("src_b"), "token")
    pairs = (
        a.join(b, "token")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("_g").alias("src_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_g").alias("src_b"), F.col("_n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    *,
    key: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document n-gram novelty — the memorization-risk / boilerplate
    signal (a doc whose grams all appear elsewhere is template or
    near-dup residue; a doc of corpus-unique grams is fresh content):

      n_grams  — the doc's DISTINCT word n-grams
      n_novel  — those occurring in NO other document (corpus doc-freq 1)
      novelty  — n_novel / n_grams, round(6); NULL when the doc is too
                 short to have an n-gram

    Scale shape: `word_shingles` emits distinct shingles per doc; the
    gram doc-frequency dim is ONE map-side-combined groupBy (a
    boilerplate gram in 10^9 docs partially aggregates per map
    partition); the per-doc stats join the doc's grams back to that dim
    on the gram key — a shuffle bounded by corpus GRAM volume, the same
    class as the dedup keeper election, never all-pairs. Exact integer
    counts + one rounded division."""
    from txtlogparser_spark.operators.dedup import word_shingles

    grams = df.select(
        F.col(key).alias("_k"),
        F.explode(word_shingles(text_col, n)).alias("_g"),
    )
    dfreq = grams.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    per = (
        grams.join(dfreq, "_g")
        .groupBy("_k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("_df") == 1).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return (
        df.select(F.col(key).alias("_k"))
        .join(per, "_k", "left")
        .select(
            F.col("_k").alias(key),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias(
                "n_grams"
            ),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias(
                "n_novel"
            ),
            F.when(
                F.col("n_grams").isNotNull(),
                F.round(F.col("n_novel") / F.col("n_grams"), 6),
            ).alias("novelty"),
        )
    )
