"""Deterministic sampling / source mixing for training-data pipelines.

Pretraining corpora are MIXED: each source (domain/crawl/dataset) gets a
target sampling rate, and the selection must be deterministic and
reproducible — re-running the pipeline on the same input must pick the
same rows regardless of partitioning, task order, or cluster size. That
rules out `df.sample()` (seeded per-partition, so the selected set
changes with the physical split) and anything driver-stateful.

The primitive here is a pure content hash: a row is kept iff

    uniform01(md5(salt ':' key)) < rate(source)

evaluated entirely in Catalyst. The md5-hex trick (compare the first 8
hex chars, zero-padded to 9, against a precomputed 9-hex-char threshold
string) makes the decision engine-portable — DuckDB computes the
identical md5 hex, so the sampled SET (not just its size) is
oracle-checkable. Fixed-width lowercase-hex comparison == numeric
comparison on the 32-bit prefix; the extra leading digit lets rate=1.0
('100000000') dominate every 8-hex value.

Scale shape: map-only. The rate table is a tiny broadcast dim keyed on
source; no shuffle, no state, no skew sensitivity — hot sources cost
exactly their row count. Sampling composes with any downstream stage
without breaking AQE or partition pruning.

Reference parity: TxtLogParser has no sampling concept; this is a
training-pipeline extension (SURVEY.md sect.2 "beyond-reference" ops).
"""

from __future__ import annotations

from typing import Dict

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_U32 = 1 << 32


def rate_threshold_hex(rate: float) -> str:
    """9-lowercase-hex-char threshold for a [0,1] rate. rate=1.0 maps to
    0x100000000 so every hash passes; rate=0.0 passes none."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(int(rate * _U32), "09x")


def hash_bucket_hex(key: Column, salt: str) -> Column:
    """Zero-padded 9-hex-char uniform bucket of a key column. Lowercase
    fixed-width hex compares lexicographically == numerically."""
    return F.concat(
        F.lit("0"),
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8),
    )


def hash_sample(
    df: DataFrame,
    rates: Dict[str, float],
    key: str = "doc_id",
    part_col: str = "source",
    salt: str = "mix-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its source's target rate, deterministically by
    content hash. `rates` is the mixing policy {source: rate}. Unlisted
    sources fall back to `default_rate`. Map-only: the policy joins as a
    broadcast dim."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(s, float(r), rate_threshold_hex(r)) for s, r in sorted(rates.items())],
        f"{part_col} string, mix_rate double, _thr string",
    )
    return (
        df.join(F.broadcast(dim), part_col, "left")
        .withColumn("_thr", F.coalesce("_thr", F.lit(rate_threshold_hex(default_rate))))
        .withColumn("mix_rate", F.coalesce("mix_rate", F.lit(float(default_rate))))
        .where(hash_bucket_hex(F.col(key), salt) < F.col("_thr"))
        .drop("_thr")
    )


def quota_sample(
    df: DataFrame,
    n_per_group: int,
    key: str = "doc_id",
    part_col: str = "source",
    salt: str = "quota-v1",
    margin: float = 4.0,
    max_widen: int = 8,
) -> DataFrame:
    """Keep exactly min(N, group size) rows per group, chosen uniformly
    without replacement and deterministically: rank rows inside each
    group by their content hash (a random-but-reproducible order) and
    keep the first N. The fixed-quota counterpart of rate-based
    hash_sample — training mixes are usually specified as 'X docs from
    each source', not a rate.

    Scale shape (round-3 VERDICT fix): a naive
    `row_number() OVER (PARTITION BY source ORDER BY hash)` funnels
    every row of a hot source through ONE task. Instead, the ranking
    hash itself prefilters: keep rows with hash < threshold where the
    per-group threshold targets ~margin×N survivors (computed from a
    K-row group-counts dim, the same md5-threshold primitive as
    hash_sample). Because the prefilter keeps a PREFIX of the hash
    order and the exact window ranks by that same (hash, key) order,
    the top-N of the survivors equals the top-N of the whole group
    whenever ≥ min(N, group size) rows survive — verified per group,
    widening the margin (×4, up to `max_widen` rounds) on the
    astronomically-unlikely undershoot. The hot source's window then
    ranks ~margin×N rows, not half the corpus.

    The selected SET is identical to the naive window (same hash, same
    order) — re-runs, different cluster sizes, and the DuckDB oracle
    all pick the same rows.

    A NULL group value is a group of its own (matching what the exact
    window's partitionBy does): the dim join is null-safe and the
    driver-side dicts sort None first, so NULL-source rows are sampled
    to the same quota instead of crashing the driver sort or silently
    vanishing through an equi-join."""
    from pyspark.sql import Window

    n = int(n_per_group)
    spark = df.sparkSession
    # K-row dim: one row per group (same class as the enrich dims)
    counts = {r[0]: int(r[1]) for r in df.groupBy(part_col).count().collect()}
    if not counts:
        return df
    need = {s: min(n, c) for s, c in counts.items()}

    keyed = df.withColumn("_qh", hash_bucket_hex(F.col(key), salt))
    surv = None
    m = float(margin)
    for _ in range(int(max_widen)):
        dim = spark.createDataFrame(
            [
                (s, rate_threshold_hex(min(1.0, m * n / c)))
                for s, c in sorted(
                    counts.items(), key=lambda kv: (kv[0] is not None, kv[0])
                )
            ],
            "_qgrp string, _qthr string",
        )
        cand = (
            keyed.join(
                F.broadcast(dim), F.col(part_col).eqNullSafe(F.col("_qgrp"))
            )
            .where(F.col("_qh") < F.col("_qthr"))
            .drop("_qthr", "_qgrp")
            .persist()
        )
        got = {r[0]: int(r[1]) for r in cand.groupBy(part_col).count().collect()}
        if all(got.get(s, 0) >= need[s] for s in counts):
            surv = cand
            break
        cand.unpersist()
        m *= 4.0
    if surv is None:
        raise RuntimeError(
            f"quota_sample prefilter undershot min(N, group size) survivors "
            f"after {max_widen} margin widenings (final margin {m}); the "
            f"hash is not behaving uniformly"
        )
    w = Window.partitionBy(part_col).orderBy(F.col("_qh"), F.col(key))
    return (
        surv.withColumn("_qr", F.row_number().over(w))
        .where(F.col("_qr") <= n)
        .drop("_qr", "_qh")
    )


def epoch_shuffle(
    df: DataFrame,
    seed: str = "epoch-0",
    key: str = "doc_id",
    out: str = "epoch_pos",
    bucket_hex: int = 2,
) -> DataFrame:
    """Deterministic global training-order permutation: assign every row
    a 0-based `epoch_pos` following the total order (md5(seed ':' key),
    key). Training runs consume packed sequences in a globally shuffled
    order, and that order must be reproducible (resume mid-epoch, re-run
    on a different cluster) and must change per epoch (vary `seed`).

    Scale shape — NO single-partition sort or window: the first
    `bucket_hex` hex chars of the shuffle hash are a PREFIX of the sort
    key, so the 16^bucket_hex uniform buckets sort consistently with the
    global hash order, and the index decomposes exactly like the page
    window (`windowing.with_global_index`): a per-bucket parallel
    row_number plus broadcast cumulative bucket offsets. Hot sources do
    not exist here — md5 buckets are uniform by construction. At 100 TB
    raise `bucket_hex` (3 → 4096 buckets, 4 → 65536) so each bucket's
    window fits one task comfortably.

    DuckDB-replayable: `row_number() OVER (ORDER BY md5(...), key) - 1`
    produces the identical permutation (lowercase-hex md5 sorts the same
    in both engines).
    """
    from txtlogparser_spark.operators.windowing import with_global_index

    sk = F.md5(F.concat(F.lit(seed + ":"), F.col(key).cast("string")))
    keyed = df.withColumn("_sk", sk).withColumn(
        "_bkt", F.substring("_sk", 1, int(bucket_hex))
    )
    return (
        with_global_index(keyed, "_bkt", ["_sk", key], out=out)
        .drop("_sk", "_bkt")
    )


def temperature_budgets(
    token_totals: Dict[str, int], total_budget: int, tau: float = 1.0
) -> Dict[str, int]:
    """Per-source TOKEN budgets from a temperature-weighted mixture
    (the multinomial temperature-sampling recipe of XLM-R/mT5):
    budget_s = total_budget * totals_s^tau / sum(totals^tau). tau=1
    reproduces natural proportions; tau->0 flattens toward uniform,
    upweighting small sources. Pure driver-side arithmetic over the
    K-row per-source totals dim (the same dim token_budget_mix already
    aggregates); deterministic. A source's budget is capped at its
    actual token total — temperature upweighting cannot mint tokens a
    small source doesn't have (the undistributed remainder is NOT
    reassigned; callers wanting exact total_budget sums should raise
    tau or total_budget)."""
    import math

    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    # log-space weights: float(c) ** tau overflows for realistic token
    # totals (1e9-1e12) once tau exceeds ~25; exp(tau*(ln c - max ln c))
    # is bounded in (0, 1] and identical after normalization
    logs = {s: tau * math.log(c) for s, c in token_totals.items() if c > 0}
    if not logs:
        return {s: 0 for s in token_totals}
    mx = max(logs.values())
    weights = {s: math.exp(l - mx) for s, l in logs.items()}
    z = sum(weights.values())
    # floor with an epsilon: the log-space round trip can land an
    # exactly-representable share (e.g. 9) at 8.999999999999998
    return {
        s: min(int(token_totals[s]), int(total_budget * w / z + 1e-9))
        for s, w in sorted(weights.items())
    } | {s: 0 for s, c in token_totals.items() if c <= 0}


def token_budget_mix(
    df: DataFrame,
    budgets: Dict[str, int],
    key: str = "doc_id",
    part_col: str = "source",
    tok_col: str = "n_tok",
    salt: str = "budget-v1",
    margin: float = 4.0,
    max_widen: int = 8,
) -> DataFrame:
    """Select documents per source, in deterministic hash order, until
    each source's TOKEN budget is met — the trainer-facing mixing step:
    training mixtures are specified in tokens ("30B tokens of web, 5B
    of code"), not row counts (quota_sample) or rates (hash_sample).
    Selection walks each group in (md5(salt:key), key) order keeping a
    document while the budget is not yet exhausted BEFORE it, so the
    overshoot is at most one document. Sources absent from `budgets`
    contribute nothing; a budget >= the source's total keeps the whole
    source. Unlike rate sampling the result is budget-EXACT per source
    (to one doc), and unlike quota_sample it is exact in tokens.

    Scale shape — same skew discipline as quota_sample (round-3
    VERDICT pattern): the exact per-group cumulative-sum window never
    sees the whole group. The ranking hash prefilters each group to a
    hash-order PREFIX of ~margin * max(budget/group_tokens, 1/count)
    of its rows: the token-fraction term targets proportional token
    mass, and the 1/count floor keeps the EXPECTED SURVIVOR COUNT
    >= margin even when a group's tokens sit in a few huge documents
    (a pure token-rate threshold can select zero ROWS from such a
    heavy-tailed group and spuriously exhaust the widen loop).
    Survivor token mass is verified >= min(budget, group total) per
    group, widening *4 on undershoot. The selected SET is identical to
    the naive full-group window: the cumulative crossing point is
    inside any verified survivor prefix by construction. NULL token
    counts participate as 0 tokens (selected for free when reached,
    never crossing the budget). DuckDB-replayable (same md5-hex
    order), partitioning-invariant, resume-stable.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    budgets = {s: int(b) for s, b in budgets.items()}
    if any(b < 0 for b in budgets.values()):
        raise ValueError("budgets must be >= 0")
    tok = F.coalesce(F.col(tok_col), F.lit(0)).cast("long")
    # K-row per-source totals dim (same class as the enrich dims)
    stats = {
        r[0]: (int(r[1]), int(r[2]))
        for r in df.groupBy(part_col)
        .agg(F.count(F.lit(1)), F.sum(tok))
        .collect()
    }
    live = {
        s: b for s, b in budgets.items() if b > 0 and s in stats
    }
    if not live:
        return df.where(F.lit(False))
    need = {s: min(b, stats[s][1]) for s, b in live.items()}

    keyed = df.withColumn("_bh", hash_bucket_hex(F.col(key), salt))
    surv = None
    m = float(margin)
    for _ in range(int(max_widen)):
        dim = spark.createDataFrame(
            [
                (
                    s,
                    rate_threshold_hex(
                        min(
                            1.0,
                            m
                            * max(
                                b / max(stats[s][1], 1), 1.0 / stats[s][0]
                            ),
                        )
                    ),
                )
                for s, b in sorted(live.items())
            ],
            f"{part_col} string, _bthr string",
        )
        cand = (
            keyed.join(F.broadcast(dim), part_col)
            .where(F.col("_bh") < F.col("_bthr"))
            .drop("_bthr")
            .persist()
        )
        got = {
            r[0]: int(r[1])
            for r in cand.groupBy(part_col).agg(F.sum(tok)).collect()
        }
        if all(got.get(s, 0) >= need[s] for s in live):
            surv = cand
            break
        cand.unpersist()
        m *= 4.0
    if surv is None:
        raise RuntimeError(
            f"token_budget_mix prefilter undershot min(budget, group "
            f"tokens) after {max_widen} margin widenings (final margin "
            f"{m}); raise margin/max_widen (extremely heavy-tailed "
            f"document sizes) or check the key column for collisions"
        )
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col("_bh"), F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bdim = spark.createDataFrame(
        sorted(live.items()), f"{part_col} string, _budget long"
    )
    return (
        surv.join(F.broadcast(bdim), part_col)
        .withColumn("_cum_before", F.sum(tok).over(w) - tok)
        .where(F.col("_cum_before") < F.col("_budget"))
        .drop("_bh", "_cum_before", "_budget")
    )


def train_eval_split(
    df: DataFrame,
    eval_frac: float,
    key: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic held-out split: adds `is_eval` (true for ~eval_frac
    of rows, stable across runs/partitionings). Same md5 primitive."""
    thr = rate_threshold_hex(eval_frac)
    return df.withColumn(
        "is_eval", hash_bucket_hex(F.col(key), salt) < F.lit(thr)
    )


def quantile_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 3,
    group_col: str | None = None,
    grid: float = 0.01,
    out: str = "bucket",
) -> DataFrame:
    """Append `out`: the row's quantile bucket (1..n_buckets, 1 = lowest
    scores) within its group — the CCNet-style head/middle/tail split
    (per-language perplexity thirds) that stratifies a corpus by a
    quality score before sampling each stratum at its own rate.

    Scale shape: the naive spelling — percent_rank() OVER (PARTITION BY
    lang ORDER BY score) — funnels every row of a hot language through
    ONE task (the same trap quota_sample's window had). Instead the
    score is quantized to an integer grid (floor(score/grid) — ties on
    a grid cell never split across buckets, which also makes the split
    deterministic and partition-invariant) and the quantiles come from
    a per-(group, cell) HISTOGRAM: one map-side-combined groupBy into a
    dim of |groups|x|occupied cells| rows, a window over that tiny dim,
    and a broadcast join back. The fact table is touched by exactly one
    extra map-side join — no per-group sort, no hot-group task. The
    cell column carries the `_bkt` audit convention (tools/
    explain_audit.py): its cumsum window funnels one row per OCCUPIED
    GRID CELL (≤ score-range/grid, e.g. 101 for a [0,1] score at
    grid 0.01) through a single task — width-bounded metadata, never
    fact rows, at any corpus size.

    Bucket rule (ntile-by-first-rank): every row of a cell takes the
    bucket of the cell's FIRST row in score order — bucket = 1 +
    floor(prev_cum * n / total) where prev_cum counts rows in strictly
    lower cells. Buckets are as equal as the grid allows: a cell holding
    many tied scores lands whole in one bucket (exactly what CCNet's
    per-language thirds do with ties). Integer/floor math end-to-end ->
    bit-exact DuckDB replay."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if grid <= 0:
        raise ValueError(f"grid must be > 0, got {grid}")
    from pyspark.sql import Window

    keys = [group_col] if group_col else []
    cell = F.floor(F.col(score_col) / F.lit(grid)).cast("long").alias("_qcell_bkt")
    # NULL scores are EXCLUDED from the histogram (they would sort
    # NULLS-FIRST into the cumulative window and inflate every real
    # cell's prev_cum) and the join back is a null-safe LEFT join, so a
    # NULL-score row survives with a NULL bucket instead of silently
    # vanishing through an equi-join; quantiles are over scored rows.
    # A NULL group VALUE is a group of its own (eqNullSafe on the keys).
    hist = (
        df.where(F.col(score_col).isNotNull())
        .select(*keys, cell)
        .groupBy(*keys, "_qcell_bkt")
        .agg(F.count(F.lit(1)).alias("_qn"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_qcell_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        *keys,
        "_qcell_bkt",
        "_qn",
        F.sum("_qn").over(w).alias("_qcum"),
        F.sum("_qn").over(Window.partitionBy(*keys)).alias("_qtot"),
    )
    # integer DIV, not float floor(/): a ratio landing a hair under an
    # integer can round UP in double and flip the bucket at a boundary
    buckets = cum.select(
        *keys,
        "_qcell_bkt",
        (
            F.lit(1)
            + F.expr(f"(_qcum - _qn) * {int(n_buckets)} DIV _qtot").cast("int")
        ).alias(out),
    )
    dim = buckets
    for k in [*keys, "_qcell_bkt"]:
        dim = dim.withColumnRenamed(k, f"_qd_{k}")
    cond = F.col("_qcell_bkt").eqNullSafe(F.col("_qd__qcell_bkt"))
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_qd_{k}"))
    return (
        df.withColumn(
            "_qcell_bkt", F.floor(F.col(score_col) / F.lit(grid)).cast("long")
        )
        .join(F.broadcast(dim), cond, "left")
        .drop("_qcell_bkt", *[f"_qd_{k}" for k in [*keys, "_qcell_bkt"]])
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    target_rows: int | None = None,
    key: str = "doc_id",
    part_col: str = "source",
    weight_col: str | None = None,
    salt: str = "tmix-v1",
) -> DataFrame:
    """Temperature-based source mixing (the mT5/XLM-R multilingual
    recipe): each group's share of the output is proportional to
    n_g^alpha — alpha=1 preserves the natural distribution, alpha=0
    flattens to uniform, alpha~0.3-0.7 up-samples small sources without
    letting the head source drown them. Rows are selected by the same
    md5-hex content hash as hash_sample, so the chosen SET is
    deterministic and partition-invariant; the appended t_rate column
    records each group's effective keep-rate.

    rate_g = min(1, target_rows * n_g^alpha / sum_h(n_h^alpha) / n_g)

    (n = row count, or sum(weight_col) when given — the token-weighted
    form). target_rows defaults to the input count (pure re-weighting:
    expected output size == input size, mass shifted toward the tail).
    Rates above 1 clip — temperature mixing UP-samples by repetition in
    a trainer's sampler, not by duplicating rows in the corpus.

    Scale shape: map-only on the fact table. The per-group mass is one
    map-side-combined groupBy into a K-row dim; the normalizer is a
    1-row scalar agg over that dim; both join back broadcast. The
    selection threshold is computed IN-PLAN as the same 9-hex-char
    string hash_sample precomputes driver-side — floor() before the
    bigint cast keeps Spark (truncating) and DuckDB (rounding) casts
    identical, so the selected set replays bit-exactly.

    Determinism fine print: the normalizer Z = sum(n^alpha) is a FLOAT
    sum, which is partition-order-nondeterministic in Spark and
    engine-order-dependent in an oracle — so each term is quantized to
    floor(n^alpha * 2^30) and summed as exact integers (the HLL
    estimator's trick), making Z (hence every rate and the selected
    set) a pure function of the data. alpha = 0.5 / 1 / 0 additionally
    spell the power as sqrt / identity / 1 — correctly-rounded IEEE
    ops identical in every engine, unlike libm pow (within-1-ulp only,
    so other alphas are deterministic per engine but the oracle compare
    carries a ~2^-22-per-group boundary-flip risk)."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    mass = F.sum(weight_col) if weight_col else F.count(F.lit(1))
    cnt = df.groupBy(part_col).agg(mass.cast("double").alias("_n"))

    def _powa(c: Column) -> Column:
        if alpha == 0.5:
            return F.sqrt(c)
        if alpha == 1.0:
            return c
        if alpha == 0.0:
            return F.lit(1.0)
        return F.pow(c, F.lit(float(alpha)))

    _Q = float(1 << 30)
    if target_rows is None:
        tgt = cnt.agg(F.sum(F.col("_n").cast("long")).cast("double").alias("_t"))
    else:
        tgt = cnt.sparkSession.range(1).select(
            F.lit(float(target_rows)).alias("_t")
        )
    z = cnt.agg(
        (
            F.sum(F.floor(_powa(F.col("_n")) * F.lit(_Q)).cast("long")).cast(
                "double"
            )
            / F.lit(_Q)
        ).alias("_z")
    )
    rates = (
        cnt.crossJoin(F.broadcast(z))
        .crossJoin(F.broadcast(tgt))
        .select(
            part_col,
            # rate 0 for zero/NULL-mass groups (an all-NULL or all-zero
            # weight_col group) instead of an ANSI DIVIDE_BY_ZERO abort;
            # _z > 0 additionally guards the degenerate corpus where
            # every group's n^alpha quantizes to 0
            F.when(
                (F.col("_n") > 0) & (F.col("_z") > 0),
                F.least(
                    F.lit(1.0),
                    F.col("_t") * _powa(F.col("_n")) / F.col("_z") / F.col("_n"),
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("t_rate"),
        )
    )
    thr = F.lower(
        F.lpad(
            F.hex(F.floor(F.col("t_rate") * F.lit(float(_U32))).cast("bigint")),
            9,
            "0",
        )
    )
    # null-safe rate join: a NULL group value is a group of its own (its
    # mass is already in the normalizer via groupBy, so an equi-join
    # here would both DROP its rows and deflate every real group's rate)
    rdim = rates.withColumnRenamed(part_col, "_tgrp")
    return (
        df.join(F.broadcast(rdim), F.col(part_col).eqNullSafe(F.col("_tgrp")))
        .where(hash_bucket_hex(F.col(key), salt) < thr)
        .drop("_tgrp")
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    *,
    n_phases: int = 3,
    seed: str = "curr-0",
    key: str = "doc_id",
    out: str = "curriculum_pos",
    bucket_hex: int = 2,
    grid: float = 0.01,
) -> DataFrame:
    """Quality-curriculum training order: stratify the corpus into
    `n_phases` quantile phases by `score_col` (phase 1 = HIGHEST
    scores — train on the cleanest stratum first, the standard
    quality-curriculum recipe), then shuffle deterministically WITHIN
    each phase. Appends `phase` (1..n_phases) and `out` (0-based
    global position following the total order (phase ASC,
    md5(seed ':' key), key)).

    Scale shape — the composition of two already-skew-proof pieces:
    `quantile_buckets` assigns phases from a grid-histogram dim (no
    per-group sort), and the global index reuses `epoch_shuffle`'s
    decomposition — the order bucket is the phase digit concatenated
    with a hash PREFIX, so the 16^bucket_hex·n_phases buckets sort
    consistently with the global order and the index is a per-bucket
    parallel row_number plus broadcast offsets. No single-partition
    sort at any size; a phase is never one task.

    DuckDB-replayable: row_number() OVER (ORDER BY phase,
    md5(seed||':'||key), key) - 1 produces the identical order.

    Rows with a NULL `score_col` are EXCLUDED (explicitly, up front): a
    curriculum position requires a phase, and a phase requires a score.
    Score the corpus first (or coalesce a default) to order every row —
    silently relying on downstream join drops is exactly the bug class
    this filter replaces."""
    from txtlogparser_spark.operators.windowing import with_global_index

    if not 2 <= n_phases <= 9:
        # the order bucket leads with the phase as ONE character so the
        # bucket string sorts (phase, hash-prefix) lexicographically
        raise ValueError(f"n_phases must be in 2..9, got {n_phases}")
    if not 1 <= int(bucket_hex) <= 8:
        # bucket_hex=0 would collapse each phase to ONE order bucket —
        # a whole phase through a single row_number task at scale
        raise ValueError(f"bucket_hex must be in 1..8, got {bucket_hex}")
    staged = quantile_buckets(
        df.where(F.col(score_col).isNotNull()),
        score_col,
        n_buckets=n_phases,
        grid=grid,
        out="_qb",
    ).withColumn(
        "phase", (F.lit(n_phases + 1) - F.col("_qb")).cast("int")
    )
    sk = F.md5(F.concat(F.lit(seed + ":"), F.col(key).cast("string")))
    keyed = staged.withColumn("_sk", sk).withColumn(
        "_bkt",
        F.concat(
            F.col("phase").cast("string"),
            F.lit("|"),
            F.substring("_sk", 1, int(bucket_hex)),
        ),
    )
    return (
        with_global_index(keyed, "_bkt", ["_sk", key], out=out)
        .drop("_sk", "_bkt", "_qb")
    )
