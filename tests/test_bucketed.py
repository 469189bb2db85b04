"""Storage bucketing (sources/bucketed.py): pin the plan shapes that
make it worth the write — co-located joins and pre-shuffled aggregates.

AQE is disabled inside these asserts: the executedPlan of an AQE query
is an AdaptiveSparkPlan wrapper whose Exchange nodes only materialize
during execution, so the static count would read 0 even for a shuffling
join (same pitfall tools/explain_audit.py documents).
"""

from contextlib import contextmanager

import pytest


@contextmanager
def _no_aqe(spark):
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


@pytest.fixture()
def corpus_tables(spark, tmp_path):
    from txtlogparser_spark.sources.bucketed import write_bucketed

    docs = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "id % 7 AS grp", "CAST(id * 13 % 997 AS BIGINT) AS n_tok"
    )
    scores = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "CAST(id % 101 AS DOUBLE) / 100 AS quality"
    )
    write_bucketed(docs, "b_docs", "doc_id", n_buckets=8,
                   path=str(tmp_path / "b_docs"))
    write_bucketed(scores, "b_scores", "doc_id", n_buckets=8,
                   path=str(tmp_path / "b_scores"))
    yield "b_docs", "b_scores"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_scores")


class TestBucketedJoin:
    def test_both_sides_bucketed_no_exchange(self, spark, corpus_tables):
        from txtlogparser_spark.sources.bucketed import (
            bucketed_join,
            exchange_count,
        )

        left, right = corpus_tables
        with _no_aqe(spark):
            # small fixtures auto-broadcast (also exchange-ish but proves
            # nothing about bucketing) — force the merge path the tables
            # would take at real scale
            thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                j = bucketed_join(spark, left, right, "doc_id")
                assert exchange_count(j) == 0, (
                    "co-located join must not shuffle"
                )
                plan = j._jdf.queryExecution().executedPlan().toString()
                assert "SortMergeJoin" in plan
                assert "Bucketed: true" in plan
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        assert j.count() == 2000

    def test_values_match_plain_join(self, spark, corpus_tables):
        left, right = corpus_tables
        j = (
            spark.table(left)
            .join(spark.table(right), "doc_id")
            .selectExpr("doc_id", "n_tok", "quality")
        )
        got = {(r["doc_id"], r["n_tok"], r["quality"]) for r in j.collect()}
        docs = {r["doc_id"]: r["n_tok"] for r in spark.table(left).collect()}
        scores = {r["doc_id"]: r["quality"] for r in spark.table(right).collect()}
        want = {(i, docs[i], scores[i]) for i in docs}
        assert got == want

    def test_one_side_bucketed_shuffles_only_probe(self, spark, corpus_tables):
        from txtlogparser_spark.sources.bucketed import exchange_count

        left, _ = corpus_tables
        plain = spark.range(0, 500).selectExpr(
            "id AS doc_id", "CAST(id AS STRING) AS tag"
        )
        with _no_aqe(spark):
            # force the merge path: a broadcast of the small side would
            # (correctly) also be exchange-free but prove nothing
            thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                j = spark.table(left).join(plain, "doc_id")
                assert exchange_count(j) == 1, (
                    "only the unbucketed side may shuffle"
                )
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    def test_groupby_on_bucket_key_no_exchange(self, spark, corpus_tables):
        from txtlogparser_spark.sources.bucketed import exchange_count

        left, _ = corpus_tables
        with _no_aqe(spark):
            agg = spark.table(left).groupBy("doc_id").sum("n_tok")
            assert exchange_count(agg) == 0

    def test_mismatched_bucket_counts_fall_back(self, spark, corpus_tables, tmp_path):
        """Different bucket counts don't co-locate (documented edge) —
        values still correct, shuffle returns."""
        from txtlogparser_spark.sources.bucketed import (
            exchange_count,
            write_bucketed,
        )

        left, _ = corpus_tables
        other = spark.range(0, 100).selectExpr("id AS doc_id", "id AS x")
        write_bucketed(other, "b_other5", "doc_id", n_buckets=5,
                       path=str(tmp_path / "b_other5"))
        try:
            with _no_aqe(spark):
                thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                try:
                    j = spark.table(left).join(spark.table("b_other5"), "doc_id")
                    assert exchange_count(j) >= 1
                finally:
                    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
            assert j.count() == 100
        finally:
            spark.sql("DROP TABLE IF EXISTS b_other5")

    def test_invalid_buckets(self, spark):
        from txtlogparser_spark.sources.bucketed import write_bucketed

        with pytest.raises(ValueError):
            write_bucketed(spark.range(3), "nope", "id", n_buckets=0)
