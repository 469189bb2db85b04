"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. Query side broadcast; per-row
  dot products via Catalyst higher-order functions (zip_with/aggregate)
  — JVM-side, no UDF; top-k via windowed row_number (partitioned by
  query — scales with queries × corpus, the exact-search baseline).
- lsh_topk: random-hyperplane (sign-LSH) bucketed variant — the scale
  path: corpus hashed once to B-bit signatures; candidates = same-bucket
  rows (multi-probe over T tables); exact cosine re-rank only on
  candidates. Hyperplanes derive deterministically from xxhash64 of
  (table, bit, dim) — no RNG state, reproducible across runs/executors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def as_double_vec(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2norm(a) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    qid: str = "query_id",
    cid: str = "vec_id",
    qvec: str = "qv",
    cvec: str = "v",
) -> DataFrame:
    sims = queries.join(F.broadcast(corpus) if _small(corpus) else corpus).withColumn(
        "sim", dot(F.col(qvec), F.col(cvec)) / (l2norm(F.col(qvec)) * l2norm(F.col(cvec)))
    )
    w = Window.partitionBy(qid).orderBy(F.desc("sim"), F.asc(cid))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, "rank", F.col(cid).alias("neighbor_id"), "sim")
    )


def _small(df: DataFrame) -> bool:
    return True  # caller controls broadcast by corpus size; default hint


def _hyperplane(table: int, bit: int, dim: int) -> Column:
    """Deterministic pseudo-random ±component from xxhash64(table,bit,dim):
    maps hash parity to ±1 (Rademacher hyperplanes — standard sign-LSH)."""
    h = F.xxhash64(F.lit(table), F.lit(bit), F.lit(dim))
    return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def signlsh_signature(vec_col: str, dim: int, bits: int = 16, table: int = 0) -> Column:
    """B-bit signature: bit b = sign(<v, r_{table,b}>) with Rademacher r.

    SQL expression rather than the DataFrame lambda API: shiftleft()'s
    DataFrame form only takes a Python-int shift, but the per-bit lambda
    needs a column shift amount (SQL shiftleft accepts expressions)."""
    return F.expr(
        f"""
        aggregate(
          sequence(0, {bits - 1}),
          cast(0 as bigint),
          (acc, b) -> acc + IF(
            aggregate(
              zip_with(
                {vec_col},
                transform(sequence(0, {dim - 1}),
                          d -> IF((xxhash64({table}, b, d) & 1) = 1, 1.0D, -1.0D)),
                (x, r) -> x * r),
              cast(0.0 as double), (a2, x) -> a2 + x) > 0,
            shiftleft(cast(1 as bigint), b),
            cast(0 as bigint)))
        """
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    dim: int,
    bits: int = 12,
    tables: int = 2,
    qid: str = "query_id",
    cid: str = "vec_id",
    qvec: str = "qv",
    cvec: str = "v",
) -> DataFrame:
    """Bucketed ANN: candidates share a signature in ≥1 table; exact
    cosine re-rank on candidates only. Recall < 1 by design — trade
    against brute_force_topk (which is the correctness oracle)."""
    c_sig = corpus.select(
        cid,
        cvec,
        *[
            signlsh_signature(cvec, dim, bits, t).alias(f"sig{t}")
            for t in range(tables)
        ],
    )
    q_sig = queries.select(
        qid,
        qvec,
        *[
            signlsh_signature(qvec, dim, bits, t).alias(f"qsig{t}")
            for t in range(tables)
        ],
    )
    cond = None
    for t in range(tables):
        c = F.col(f"qsig{t}") == F.col(f"sig{t}")
        cond = c if cond is None else (cond | c)
    cands = q_sig.join(c_sig, cond)
    sims = cands.withColumn(
        "sim", dot(F.col(qvec), F.col(cvec)) / (l2norm(F.col(qvec)) * l2norm(F.col(cvec)))
    )
    w = Window.partitionBy(qid).orderBy(F.desc("sim"), F.asc(cid))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, "rank", F.col(cid).alias("neighbor_id"), "sim")
    )
