"""BM25 ranked retrieval over a document corpus.

The sparse-retrieval counterpart of operators/similarity.py's dense ANN
family: training-data pipelines run BM25 (Robertson/Spärck Jones;
the Lucene variant with the always-positive idf) for decontamination
probes ("which training docs score highest against this eval query"),
targeted corpus audits, and retrieval-based data selection. The
reference has no retrieval concept — training-pipeline extension
(SURVEY.md §2 beyond-reference ops).

Scale shape — TWO map-only corpus passes, zero joins on the big side:

  pass 1  one scalar aggregate computes N (docs), total word count
          (→ avgdl) and per-term document frequencies for the UNION of
          all query terms — T+2 values in ONE row, driver-collected
          (the sanctioned scalar-collect shape; queries are a tiny
          driver-side literal list, like a trained BPE merge list).
  pass 2  per-doc tf for each term is a map-side array scan
          (size(filter(words, w == term))); idf and avgdl arrive as
          inlined literals, so each query's score is a single closed
          Catalyst expression. Rows scoring 0 (no term hits) are
          filtered MAP-SIDE — only candidate docs (bounded by the
          query terms' posting sizes, not the corpus) reach the
          per-query top-k.

Top-k per query runs row_number over the candidate set partitioned by
query id — the shuffle moves candidates only. With Lucene's
idf = ln(1 + (N - df + 0.5)/(df + 0.5)) > 0, score > 0 ⟺ some term
matched, so the map-side filter is exactly the posting-union.

Determinism: idf/avgdl are IEEE doubles computed from exact integer
counts; each score is the same left-to-right sum of per-term
fractions in query-literal order, so both engines produce
bit-identical doubles and agree on the RANKING (the pmi_collocations
convention), with ties broken (score DESC, doc_id ASC).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _tf(words: Column, term: str) -> Column:
    return F.size(F.filter(words, lambda w: w == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    queries: list,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    lowercase: bool = True,
) -> DataFrame:
    """Top-k documents per query by BM25.

    queries: [(query_id, [term, ...]), ...] — a driver-side literal
    list (the realistic shape: a handful of eval/audit probes against
    a huge corpus). Returns (query_id, rank, doc_id, score) with
    score rounded to 6 for cross-engine hashing; rank 1..k by
    (score DESC, doc_id ASC).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not queries:
        raise ValueError("queries must be non-empty")
    terms = sorted({t for _, ts in queries for t in ts})
    if not terms:
        raise ValueError("queries contain no terms")

    from txtlogparser_spark.functions.text import doc_words

    words = doc_words(text_col, lowercase)
    staged = docs.select(
        F.col(id_col).alias("_id"), words.alias("_ws")
    ).select(
        "_id",
        F.size("_ws").cast("long").alias("_dl"),
        *[
            _tf(F.col("_ws"), t).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )

    # pass 1: N, Σdl, df_t — one row, T+2 exact integers
    stats = staged.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_dl").cast("long").alias("_sdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n_docs = int(stats["_n"] or 0)
    if n_docs == 0:
        # empty-corpus result keeps id_col's ACTUAL type so both paths
        # return the same schema (a hardcoded long would diverge from a
        # string-keyed corpus)
        spark = docs.sparkSession
        id_type = docs.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [],
            f"query_id string, rank int, doc_id {id_type}, score double",
        )
    avgdl = int(stats["_sdl"] or 0) / n_docs
    idf = {}
    for i, t in enumerate(terms):
        df_t = int(stats[f"_df{i}"] or 0)
        idf[t] = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))

    # pass 2: per-query closed-form score, map-side candidate filter
    term_ix = {t: i for i, t in enumerate(terms)}
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("_dl").cast("double") / F.lit(avgdl))
    )

    def _score(ts: list) -> Column:
        s = F.lit(0.0)
        for t in ts:  # query-literal order — the oracle replays it
            tf = F.col(f"_tf{term_ix[t]}").cast("double")
            s = s + F.lit(idf[t]) * (
                tf * F.lit(k1 + 1.0) / (tf + norm)
            )
        return s

    # ONE projection emits every query's score per doc (stack: Q rows
    # per doc), so pass 2 reads the corpus once no matter how many
    # queries probe it
    pairs: list = []
    for qid, ts in queries:
        pairs += [F.lit(str(qid)), _score(ts)]
    cand = staged.select(
        F.col("_id").alias("doc_id"),
        F.stack(F.lit(len(queries)), *pairs).alias("query_id", "_s"),
    ).where(F.col("_s") > 0.0)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_s"), F.asc("doc_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id", F.round("_s", 6).alias("score")
        )
    )
