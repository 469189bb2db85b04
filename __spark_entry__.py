"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship log-routing pipeline on sf0.001.
`queries()` exposes one entry per implemented operator (SURVEY.md §2 +
training-data ops); `oracle_sql()` gives the DuckDB-equivalent ANSI SQL.

The log-pipeline queries re-express TxtLogParser's filter-workspace
semantics (FilterData.cpp:110-238, OutputData.cpp:272-501) over the
driver's `documents` table treated as the line corpus (doc_id, text,
source). The chosen patterns deliberately avoid cross-filter span overlap
so first-match-wins claiming coincides with plain matching and stays
ANSI-SQL-expressible; overlap/precedence quirks are pinned by the pytest
suite against the pure-Python oracle instead (tests/test_pipeline_e2e.py).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from txtlogparser_spark.config import FilterSpec, SearchSpec, WorkspaceConfig
from txtlogparser_spark.operators.aggregate import filter_metrics, search_metrics
from txtlogparser_spark.operators.route import route_tag_column, filter_predicate, survival_prefilter
from txtlogparser_spark.functions.spans import attach_spans

# ---------------------------------------------------------------- workspace

def driver_workspace() -> WorkspaceConfig:
    """Filter/search workspace over the documents vocabulary. Patterns
    exercise: cs substring, ci whole-word (isalnum boundaries), ci regex
    alternation, cs whole-word — mutually non-overlapping claims."""
    return WorkspaceConfig(
        id=1,
        name="driver-ws",
        filters=[
            FilterSpec(201, 0, "scan", caseSensitive=True, wholeWord=False, regex=False),
            FilterSpec(202, 1, "JOIN", caseSensitive=False, wholeWord=True, regex=False),
            FilterSpec(203, 2, "b(ig|atch)", caseSensitive=False, wholeWord=False, regex=True),
            FilterSpec(204, 3, "filter", caseSensitive=True, wholeWord=True, regex=False),
        ],
        searches=[
            SearchSpec(301, 0, "query", caseSensitive=False, wholeWord=False, regex=False),
            SearchSpec(302, 1, "s(low|mall)", caseSensitive=False, wholeWord=False, regex=True),
        ],
    ).validate()


# SQL survival conditions per filter (exact on this corpus: patterns never
# straddle claims, so claiming == matching; see module docstring).
_SQL_F201 = "contains(text, 'scan')"
_SQL_F202 = "regexp_matches(lower(text), '(^|[^0-9a-z])join($|[^0-9a-z])')"
_SQL_F203 = "regexp_matches(text, '(?i)b(ig|atch)')"
_SQL_F204 = "regexp_matches(text, '(^|[^0-9a-zA-Z])filter($|[^0-9a-zA-Z])')"
_SQL_SURVIVAL = f"({_SQL_F201} OR {_SQL_F202} OR {_SQL_F203} OR {_SQL_F204})"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → line model: line_no = 0-based order within source (by
    doc_id), source_rank = dense rank of source name. Deterministic and
    reproducible in ANSI SQL for the oracle side."""
    d = _docs(spark, sf_dir)
    w_line = Window.partitionBy("source").orderBy("doc_id")
    w_rank = Window.orderBy("source")
    return d.withColumn("line_no", F.row_number().over(w_line) - 1).withColumn(
        "source_rank", F.dense_rank().over(w_rank) - 1
    )


def _routed(spark: SparkSession, sf_dir: str, with_search: bool = False) -> DataFrame:
    ws = driver_workspace()
    filters = ws.enabled_filters()
    searches = ws.enabled_searches() if with_search else []
    df = _docs(spark, sf_dir).where(
        survival_prefilter(filters, F.col("text"), spark)
    )
    df = attach_spans(df, "text", filters, searches, include_search=with_search)
    df = df.where(filter_predicate(F.col("filter_spans")))
    return df.withColumn("route", route_tag_column(filters, F.col("filter_spans")))


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse→route→aggregate over sf0.001 documents."""
    return q_log_route(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------- queries

def q_log_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-P5: predicate compile + span claiming + OR-survival + CASE route."""
    return _routed(spark, sf_dir).select("doc_id", "source", "route")


def q_log_filter_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: per-filter occurrence (claimed spans) + matched-line counts."""
    routed = _routed(spark, sf_dir)
    return filter_metrics(routed).orderBy("filter_id")


def q_log_search_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/A3: search annotate pass over the filtered set (never drops rows)."""
    routed = _routed(spark, sf_dir, with_search=True)
    return search_metrics(routed).orderBy("search_id")


def q_log_passthrough_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/P1/W1/S5: pass-through (no filters), global total order
    (source_rank, line_no), top-of-window page with display prefix."""
    lines = _doc_lines(spark, sf_dir)
    w = Window.orderBy("source_rank", "line_no")
    page = (
        lines.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 100)
        .withColumn(
            "display_prefix",
            F.format_string(
                "%03d [%02d:%06d]", "rn", "source_rank", F.col("line_no") + 1
            ),
        )
    )
    return page.select("display_prefix", "doc_id")


def q_log_nav_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1-N4 substrate: ordered per-filter match-position table (the
    m_filterLineMap analog keyed by output index)."""
    routed = _routed(spark, sf_dir)
    w_line = Window.partitionBy("source").orderBy("doc_id")
    w_rank = Window.orderBy("source")
    indexed = (
        routed.withColumn("line_no", F.row_number().over(w_line) - 1)
        .withColumn("source_rank", F.dense_rank().over(w_rank) - 1)
        .withColumn(
            "output_index",
            F.row_number().over(Window.orderBy("source_rank", "line_no")) - 1,
        )
    )
    sp = F.explode("filter_spans").alias("sp")
    return (
        indexed.select("output_index", sp)
        .where(F.col("sp.filter_id") != -1)
        .select(
            F.col("sp.filter_id").alias("filter_id"),
            "output_index",
            F.col("sp.start").alias("start"),
            F.col("sp.end").alias("end"),
        )
        .orderBy("filter_id", "output_index", "start")
    )


def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregate; decimal sums for cross-engine determinism."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_join_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast enrich join chain: orders ⋈ customer ⋈ nation."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("n_name")
    )


def q_window_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 orders per customer by total price."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey")
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate over the events stream table (batch view
    of the Structured Streaming plan: same groupBy(window) shape)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .orderBy("hour", "event_type")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); keeper = min doc_id."""
    d = _docs(spark, sf_dir)
    w = Window.partitionBy(F.md5("text"))
    return d.select(
        "doc_id",
        F.min("doc_id").over(w).alias("keeper_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs: 3-gram word-shingle Jaccard ≥ 0.5 via
    shingle-explode self-join (the scalable shape: shuffle on shingle,
    never O(n²) doc pairs)."""
    d = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("w"))
    shingles = F.when(
        F.size("w") >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 3),
                lambda i: F.concat_ws(
                    " ", F.element_at("w", i + 1), F.element_at("w", i + 2), F.element_at("w", i + 3)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", F.explode(shingles).alias("shingle"))
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .withColumn("jacc", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .where(F.col("jacc") >= 0.5)
        .select("doc_a", "doc_b", "jacc")
        .orderBy("doc_a", "doc_b")
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 10 (the exact
    baseline; LSH-bucketed variant is the scale path)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = e.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    q = v.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    sims = (
        q.join(v.where(F.col("vec_id") >= 10).hint("broadcast"))
        .withColumn("sim", dot / (norm(F.col("qv")) * norm(F.col("v"))))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 4).alias("sim_r"))
        .orderBy("query_id", "rank")
    )


def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-corpus profile per language tag."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.size(F.split("text", " "))).alias("total_words"),
        )
        .orderBy("lang")
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality scoring: token count, stopword ratio, fingerprint."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    stops = F.size(F.filter(words, lambda w: (w == "a") | (w == "the")))
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.round(stops / F.size(words), 6).alias("stopword_ratio"),
        F.col("text").contains("dup").alias("has_dup_marker"),
        F.substring(F.md5("text"), 1, 16).alias("fingerprint"),
    )


def q_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting (BPE-ish word/number segmentation)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("[A-Za-z0-9]+")).alias("n_tokens"),
        F.length("text").alias("n_chars_m"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "log_route": q_log_route,
        "log_filter_counts": q_log_filter_counts,
        "log_search_counts": q_log_search_counts,
        "log_passthrough_page": q_log_passthrough_page,
        "log_nav_matches": q_log_nav_matches,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "join_orders_per_nation": q_join_orders_per_nation,
        "window_top3_orders": q_window_top3_orders,
        "events_hourly": q_events_hourly,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "ann_cosine_topk": q_ann_cosine_topk,
        "lang_stats": q_lang_stats,
        "text_quality": q_text_quality,
        "token_count_regex": q_token_count_regex,
    }


def oracle_sql() -> dict[str, str]:
    counts_cte = f"""
      WITH m AS (
        SELECT doc_id,
          CAST((length(text) - length(replace(text, 'scan', ''))) / 4 AS BIGINT) AS c201,
          len(list_filter(string_split(lower(text), ' '), w -> w = 'join')) AS c202,
          len(regexp_extract_all(text, '(?i)b(ig|atch)')) AS c203,
          len(list_filter(string_split(text, ' '), w -> w = 'filter')) AS c204
        FROM documents
      )
    """
    return {
        "log_route": f"""
            SELECT doc_id, source,
              CASE WHEN {_SQL_F201} THEN 201
                   WHEN {_SQL_F202} THEN 202
                   WHEN {_SQL_F203} THEN 203
                   WHEN {_SQL_F204} THEN 204 END AS route
            FROM documents
            WHERE {_SQL_SURVIVAL}
        """,
        "log_filter_counts": counts_cte
        + """
            SELECT filter_id, SUM(c) AS occurrence_count, COUNT(*) AS line_count FROM (
              SELECT doc_id, 201 AS filter_id, c201 AS c FROM m WHERE c201 > 0
              UNION ALL SELECT doc_id, 202, c202 FROM m WHERE c202 > 0
              UNION ALL SELECT doc_id, 203, c203 FROM m WHERE c203 > 0
              UNION ALL SELECT doc_id, 204, c204 FROM m WHERE c204 > 0
            ) GROUP BY filter_id ORDER BY filter_id
        """,
        "log_search_counts": f"""
            WITH surv AS (SELECT * FROM documents WHERE {_SQL_SURVIVAL}),
            s AS (
              SELECT doc_id,
                CAST((length(lower(text)) - length(replace(lower(text), 'query', ''))) / 5 AS BIGINT) AS c301,
                len(regexp_extract_all(text, '(?i)s(low|mall)')) AS c302
              FROM surv
            )
            SELECT search_id, SUM(c) AS occurrence_count, COUNT(*) AS line_count FROM (
              SELECT doc_id, 301 AS search_id, c301 AS c FROM s WHERE c301 > 0
              UNION ALL SELECT doc_id, 302, c302 FROM s WHERE c302 > 0
            ) GROUP BY search_id ORDER BY search_id
        """,
        "log_passthrough_page": """
            WITH l AS (
              SELECT doc_id, source,
                row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS line_no,
                dense_rank() OVER (ORDER BY source) - 1 AS source_rank
              FROM documents
            ), o AS (
              SELECT *, row_number() OVER (ORDER BY source_rank, line_no) AS rn FROM l
            )
            SELECT printf('%03d [%02d:%06d]', rn, source_rank, line_no + 1) AS display_prefix, doc_id
            FROM o WHERE rn <= 100
        """,
        # log_nav_matches: span offsets not ANSI-SQL-expressible → rows-only check
        "tpch_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
        """,
        "join_orders_per_nation": """
            SELECT n_name, COUNT(*) AS order_count,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "window_top3_orders": """
            SELECT o_custkey, rk, o_orderkey FROM (
              SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders
            ) WHERE rk <= 3
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
              COUNT(*) AS event_count,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
            FROM events GROUP BY 1, 2 ORDER BY hour, event_type
        """,
        "dedup_exact": """
            SELECT doc_id,
              MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
              doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
            FROM documents
        """,
        "dedup_ngram_jaccard": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                  unnest([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                          for i in range(1, len(words) - 1)]) AS shingle
                FROM w)
            ),
            cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
              ROUND(inter * 1.0 / (ca.n + cb.n - inter), 6) AS jacc
            FROM pairs JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
            WHERE inter * 1.0 / (ca.n + cb.n - inter) >= 0.5
            ORDER BY doc_a, doc_b
        """,
        "ann_cosine_topk": """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 10),
            sims AS (
              SELECT query_id, vec_id AS neighbor_id,
                list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS sim
              FROM q, v WHERE vec_id >= 10
            )
            SELECT query_id, rank, neighbor_id, ROUND(sim, 4) AS sim_r FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM sims
            ) WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "lang_stats": """
            SELECT lang, COUNT(*) AS doc_count, SUM(n_chars) AS total_chars,
              SUM(len(string_split(text, ' '))) AS total_words
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "text_quality": """
            SELECT doc_id,
              len(string_split(text, ' ')) AS n_words,
              ROUND(len(list_filter(string_split(text, ' '), w -> w = 'a' OR w = 'the'))
                    * 1.0 / len(string_split(text, ' ')), 6) AS stopword_ratio,
              contains(text, 'dup') AS has_dup_marker,
              substr(md5(text), 1, 16) AS fingerprint
            FROM documents
        """,
        "token_count_regex": """
            SELECT doc_id,
              len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
              length(text) AS n_chars_m
            FROM documents
        """,
    }
