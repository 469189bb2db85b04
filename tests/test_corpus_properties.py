"""Property tests for the corpus operators against local Python models.

Each property runs a handful of hypothesis-generated datasets through
Spark and an independent pure-Python reference — the same
oracle-by-reimplementation discipline as the span matcher's
tests/test_spans_property.py. Example counts are small (Spark round
trips are seconds each); the generators bias toward the interesting
edges (empty groups, capacity-sized and oversized docs, rate
boundaries)."""

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

lens_strategy = st.lists(
    st.integers(min_value=0, max_value=200), min_size=1, max_size=40
)


class TestPackingProperties:
    @given(lens=lens_strategy, cap=st.sampled_from([1, 7, 64, 128]))
    @SET
    def test_chunk_pack_matches_python_model(self, spark, lens, cap):
        from txtlogparser_spark.operators.packing import chunk_pack

        rows = [("s", i, n) for i, n in enumerate(lens)]
        df = spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])
        got = {
            r["doc_id"]: (
                r["tok_start"], r["first_chunk"], r["last_chunk"],
                r["chunk_offset"], r["n_chunks"],
            )
            for r in chunk_pack(df, capacity=cap, bucket_width=8).collect()
        }
        start = 0
        for i, n in enumerate(lens):
            end = start + n
            fc = start // cap
            lc = (end - 1) // cap if n > 0 else fc
            assert got[i] == (start, fc, lc, start % cap, lc - fc + 1)
            start = end

    @given(lens=lens_strategy, cap=st.sampled_from([1, 50, 128]))
    @SET
    def test_greedy_pack_matches_python_model(self, spark, lens, cap):
        from txtlogparser_spark.operators.packing import greedy_pack

        rows = [("s", i, n) for i, n in enumerate(lens)]
        df = spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])
        got = {
            r["doc_id"]: (r["bin_id"], r["pos_in_bin"], r["bin_fill_after"])
            for r in greedy_pack(df, capacity=cap).collect()
        }
        b = p = fill = 0
        for i, n in enumerate(lens):
            if fill > 0 and fill + n > cap:
                b, p, fill = b + 1, 0, 0
            fill += n
            assert got[i] == (b, p, fill)
            p += 1


class TestSamplingProperties:
    @given(
        r1=st.sampled_from([0.0, 0.1, 0.25, 0.5]),
        delta=st.sampled_from([0.1, 0.25, 0.5]),
    )
    @SET
    def test_rate_monotone_nesting(self, spark, r1, delta):
        """Threshold-compare sampling is MONOTONE: raising a source's
        rate only ADDS rows — the lower-rate selection is always a
        subset. (This is what makes mix re-weighting reproducible:
        upsampling a source never churns the rows already chosen.)"""
        from txtlogparser_spark.operators.sampling import hash_sample

        r2 = min(1.0, r1 + delta)
        df = spark.range(800).select(
            F.col("id").alias("doc_id"), F.lit("s").alias("source")
        )
        lo = {r["doc_id"] for r in hash_sample(df, {"s": r1}).collect()}
        hi = {r["doc_id"] for r in hash_sample(df, {"s": r2}).collect()}
        assert lo <= hi

    @given(n=st.integers(min_value=1, max_value=25))
    @SET
    def test_quota_subset_nesting(self, spark, n):
        """quota_sample(N) ⊂ quota_sample(N+k): hash-rank order is a
        fixed total order per group, so growing the quota only extends
        the prefix."""
        from txtlogparser_spark.operators.sampling import quota_sample

        df = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), F.col("id") % 4).alias("source"),
        )
        small = {r["doc_id"] for r in quota_sample(df, n).collect()}
        big = {r["doc_id"] for r in quota_sample(df, n + 5).collect()}
        assert small <= big


class TestSketchProperties:
    @given(
        words=st.lists(
            st.sampled_from(["a", "b", "c", "dd", "ee", "f1", "g2"]),
            min_size=1,
            max_size=120,
        )
    )
    @SET
    def test_cms_never_underestimates(self, spark, words):
        from collections import Counter

        from txtlogparser_spark.operators.sketches import cms_build, cms_estimate

        df = spark.createDataFrame([(w,) for w in words], ["item"])
        sk = cms_build(df, depth=3, width=16)
        est = {
            r["item"]: r["est_n"]
            for r in cms_estimate(
                sk, df.select("item").distinct(), depth=3, width=16
            ).collect()
        }
        true = Counter(words)
        for w, t in true.items():
            assert est[w] >= t
            assert est[w] <= len(words)  # cell can't exceed the stream
