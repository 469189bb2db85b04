"""Round-3 corpus operators: decontamination, repetition quality,
deterministic sampling/mixing, sequence packing."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "alpha beta gamma delta epsilon zeta eta theta", "s0"),
        (1, "iota kappa lambda mu nu xi omicron pi", "s0"),
        (2, "alpha beta gamma delta other words here now", "s1"),  # shares 4-gram with 0
        (3, "rho sigma tau upsilon phi chi psi omega", "s1"),
        (4, "spam spam spam spam spam spam spam spam", "s1"),  # degenerate repetition
        (5, "one two one two one two one two", "s2"),
    ]
    return spark.createDataFrame(base, ["doc_id", "text", "source"])


class TestDecontaminate:
    def test_flags_and_removal(self, spark, docs):
        from txtlogparser_spark.operators.decontaminate import (
            contamination_flags,
            decontaminate,
        )

        train = docs.where(F.col("doc_id") != 0)
        ev = docs.where(F.col("doc_id") == 0)
        flags = {
            r["doc_id"]: (r["is_contaminated"], r["n_hit_shingles"], r["first_hit"])
            for r in contamination_flags(train, ev, n=4).collect()
        }
        assert flags[2][0] is True
        assert flags[2][1] == 1 and flags[2][2] == "alpha beta gamma delta"
        for clean in (1, 3, 4, 5):
            assert flags[clean] == (False, 0, None)

        kept = {r["doc_id"] for r in decontaminate(train, ev, n=4).collect()}
        assert kept == {1, 3, 4, 5}

    def test_broadcast_probe_side(self, spark, docs):
        """The eval n-gram set must reach the join as a broadcast — the
        100 TB shape is a map-side probe, not a shuffle of train grams
        against eval grams."""
        from txtlogparser_spark.operators.decontaminate import contamination_flags

        out = contamination_flags(docs, docs.limit(2), n=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_ngram_longer_than_doc_is_clean(self, spark, docs):
        from txtlogparser_spark.operators.decontaminate import contamination_flags

        out = contamination_flags(docs, docs, n=50).collect()
        assert all(not r["is_contaminated"] for r in out)


@pytest.fixture(scope="module")
def token_docs(spark):
    """Pre-tokenized sequences: doc 2 shares tokens[0:4] with doc 0;
    docs 1/3 are disjoint; doc 4 is shorter than any 4-gram."""
    base = [
        (0, [10, 11, 12, 13, 14, 15]),
        (1, [20, 21, 22, 23, 24, 25]),
        (2, [10, 11, 12, 13, 99, 98]),
        (3, [30, 31, 32, 33, 34, 35]),
        (4, [10, 11, 12]),
    ]
    return spark.createDataFrame(base, ["doc_id", "tokens"])


class TestTokenDecontaminate:
    def test_flags_and_removal(self, spark, token_docs):
        """Independent model: doc 2 shares exactly one distinct 4-gram
        (10,11,12,13) with eval doc 0; everything else is clean."""
        import hashlib

        from txtlogparser_spark.operators.decontaminate import (
            decontaminate_tokens,
            token_contamination_flags,
        )

        train = token_docs.where(F.col("doc_id") != 0)
        ev = token_docs.where(F.col("doc_id") == 0)
        flags = {
            r["doc_id"]: (r["is_contaminated"], r["n_hit_grams"], r["first_hit"])
            for r in token_contamination_flags(train, ev, n=4).collect()
        }
        want_digest = hashlib.md5(b"10,11,12,13").hexdigest()
        assert flags[2] == (True, 1, want_digest)
        for clean in (1, 3, 4):
            assert flags[clean] == (False, 0, None)

        kept = {r["doc_id"] for r in decontaminate_tokens(train, ev, n=4).collect()}
        assert kept == {1, 3, 4}

    def test_intra_doc_repeats_count_distinct(self, spark):
        """A train doc repeating a contaminated gram 3x still reports
        n_hit_grams=1 — the count is DISTINCT shared grams."""
        from txtlogparser_spark.operators.decontaminate import (
            token_contamination_flags,
        )

        train = spark.createDataFrame(
            [(1, [7, 8, 7, 8, 7, 8, 7, 8])], ["doc_id", "tokens"]
        )
        ev = spark.createDataFrame([(0, [7, 8])], ["doc_id", "tokens"])
        row = token_contamination_flags(train, ev, n=2).first()
        # train's (7,8) appears 4x but eval's gram set is {(7,8)} — the
        # report counts DISTINCT shared grams, so exactly 1
        assert row["is_contaminated"] and row["n_hit_grams"] == 1

    def test_broadcast_probe_no_python(self, spark, token_docs):
        """100 TB shape: eval grams broadcast AND the whole plan stays
        Catalyst-only (token_ngrams is a pure HOF — no Python stage)."""
        from txtlogparser_spark.operators.decontaminate import (
            token_contamination_flags,
        )

        out = token_contamination_flags(token_docs, token_docs.limit(1), n=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan and "ArrowEval" not in plan

    def test_gram_longer_than_doc_is_clean(self, spark, token_docs):
        from txtlogparser_spark.operators.decontaminate import (
            token_contamination_flags,
        )

        out = token_contamination_flags(token_docs, token_docs, n=50).collect()
        assert len(out) == 5
        assert all(not r["is_contaminated"] for r in out)


class TestRepetition:
    def test_fractions(self, spark, docs):
        from txtlogparser_spark.functions.text import (
            duplicate_word_fraction,
            is_repetitive,
            top_bigram_fraction,
        )

        out = {
            r["doc_id"]: r
            for r in docs.select(
                "doc_id",
                duplicate_word_fraction().alias("dup"),
                top_bigram_fraction().alias("top2"),
                is_repetitive().alias("rep"),
            ).collect()
        }
        # all-distinct doc: no repetition
        assert out[0]["dup"] == 0.0
        assert out[0]["top2"] == pytest.approx(1 / 7, abs=1e-6)
        assert not out[0]["rep"]
        # 8x same word: 7/8 dup, all 7 bigrams identical
        assert out[4]["dup"] == pytest.approx(7 / 8, abs=1e-6)
        assert out[4]["top2"] == 1.0
        assert out[4]["rep"]
        # alternating pair: 6/8 dup words, 'one two' bigram = 4/7
        assert out[5]["dup"] == pytest.approx(6 / 8, abs=1e-6)
        assert out[5]["top2"] == pytest.approx(4 / 7, abs=1e-6)
        assert out[5]["rep"]

    def test_short_doc_guard(self, spark):
        from txtlogparser_spark.functions.text import top_bigram_fraction

        one = spark.createDataFrame([(0, "word")], ["doc_id", "text"])
        assert one.select(top_bigram_fraction().alias("t")).first()["t"] == 0.0


class TestHashSample:
    def test_rates_and_determinism(self, spark):
        from txtlogparser_spark.operators.sampling import hash_sample

        rows = [(i, "hot" if i % 2 == 0 else "cold") for i in range(2000)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        rates = {"hot": 0.25, "cold": 1.0}
        got = hash_sample(df, rates).groupBy("source").count().collect()
        counts = {r["source"]: r["count"] for r in got}
        assert counts["cold"] == 1000  # rate 1.0 keeps everything
        assert 150 < counts["hot"] < 350  # ~250 expected

        # determinism: identical selected SET across repartitionings
        a = {r["doc_id"] for r in hash_sample(df, rates).collect()}
        b = {
            r["doc_id"]
            for r in hash_sample(df.repartition(17, "doc_id"), rates).collect()
        }
        assert a == b

    def test_unlisted_source_default(self, spark):
        from txtlogparser_spark.operators.sampling import hash_sample

        df = spark.createDataFrame([(1, "x"), (2, "y")], ["doc_id", "source"])
        assert hash_sample(df, {"x": 1.0}).count() == 1
        assert hash_sample(df, {"x": 1.0}, default_rate=1.0).count() == 2

    def test_split_frac(self, spark):
        from txtlogparser_spark.operators.sampling import train_eval_split

        df = spark.range(10000).withColumnRenamed("id", "doc_id")
        n_eval = train_eval_split(df, 0.1).where("is_eval").count()
        assert 800 < n_eval < 1200

    def test_threshold_hex(self):
        from txtlogparser_spark.operators.sampling import rate_threshold_hex

        assert rate_threshold_hex(0.0) == "000000000"
        assert rate_threshold_hex(1.0) == "100000000"
        assert rate_threshold_hex(0.5) == "080000000"
        with pytest.raises(ValueError):
            rate_threshold_hex(1.5)


class TestPacking:
    def _mk(self, spark):
        rows = [
            ("s0", 0, 60), ("s0", 1, 50), ("s0", 2, 30), ("s0", 3, 100),
            ("s0", 4, 10), ("s1", 5, 120), ("s1", 6, 5),
        ]
        return spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])

    def test_chunk_pack_small(self, spark):
        from txtlogparser_spark.operators.packing import chunk_pack

        out = {
            r["doc_id"]: r
            for r in chunk_pack(self._mk(spark), capacity=100).collect()
        }
        # s0 stream offsets: 0,60,110,140,240
        assert (out[0]["tok_start"], out[0]["first_chunk"], out[0]["last_chunk"]) == (0, 0, 0)
        assert (out[1]["tok_start"], out[1]["first_chunk"], out[1]["last_chunk"]) == (60, 0, 1)
        assert out[1]["n_chunks"] == 2  # straddles the 100 cut
        assert (out[3]["tok_start"], out[3]["first_chunk"], out[3]["last_chunk"]) == (140, 1, 2)
        assert out[4]["chunk_offset"] == 40
        # s1 independent stream
        assert (out[5]["first_chunk"], out[5]["last_chunk"]) == (0, 1)

    def test_chunk_pack_bucket_invariance(self, spark):
        """Two-level cumsum must equal the single-window cumsum for any
        bucket width (including widths that split the key range)."""
        from txtlogparser_spark.operators.packing import chunk_pack

        rows = [("s", i, 7 + (i * 13) % 40) for i in range(200)]
        df = spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])
        wide = chunk_pack(df, capacity=64, bucket_width=1 << 30)
        narrow = chunk_pack(df, capacity=64, bucket_width=16)
        a = sorted(map(tuple, wide.collect()))
        b = sorted(map(tuple, narrow.collect()))
        assert a == b

    def test_greedy_pack(self, spark):
        from txtlogparser_spark.operators.packing import greedy_pack

        out = {
            r["doc_id"]: (r["bin_id"], r["pos_in_bin"], r["bin_fill_after"])
            for r in greedy_pack(self._mk(spark), capacity=100).collect()
        }
        # s0: 60 | 50(new bin) 30 10 -> fill 90 | 100(own bin? 50+30+10=90, +100>100 -> new)
        assert out[0] == (0, 0, 60)
        assert out[1] == (1, 0, 50)
        assert out[2] == (1, 1, 80)
        assert out[3] == (2, 0, 100)
        assert out[4] == (2, 1, 110) or out[4] == (3, 0, 10)
        # doc 3 fills bin exactly (100): doc 4 (10) must open a new bin
        assert out[4] == (3, 0, 10)
        # s1: 120 > capacity -> own bin, never split
        assert out[5] == (0, 0, 120)
        assert out[6] == (1, 0, 5)

    def test_greedy_pack_never_splits_and_orders(self, spark):
        from txtlogparser_spark.operators.packing import greedy_pack

        rows = [("s", i, 30 + (i * 7) % 50) for i in range(300)]
        df = spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])
        got = greedy_pack(df, capacity=128).orderBy("doc_id").collect()
        fill = 0
        last_bin = 0
        for r in got:
            if r["bin_id"] != last_bin:
                assert r["bin_id"] == last_bin + 1  # bins open sequentially
                assert r["pos_in_bin"] == 0
                fill = 0
                last_bin = r["bin_id"]
            fill += r["n_tok"]
            assert r["bin_fill_after"] == fill
            assert fill <= 128 or r["pos_in_bin"] == 0  # overflow only for solo docs

    def test_assemble_chunks_reconstructs_stream(self, spark):
        from txtlogparser_spark.operators.packing import assemble_chunks

        lens = {"s0": [60, 50, 30, 100, 10], "s1": [120, 5]}
        rows = []
        did = 0
        for src, ls in lens.items():
            for L in ls:
                rows.append((src, did, [f"d{did}_{i}" for i in range(L)]))
                did += 1
        df = spark.createDataFrame(rows, "source string, doc_id long, tokens array<string>")
        out = assemble_chunks(df, capacity=100).collect()
        by_src = {}
        for r in sorted(out, key=lambda r: (r["source"], r["chunk_id"])):
            assert r["n_tok"] == len(r["tokens"])
            by_src.setdefault(r["source"], []).append(r)
        for src, ls in lens.items():
            chunks = by_src[src]
            # chunk ids dense from 0; all but last exactly at capacity
            assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
            for c in chunks[:-1]:
                assert c["n_tok"] == 100
            # concatenation reproduces the doc stream exactly
            stream = [t for r in sorted(rows, key=lambda x: x[1]) if r[0] == src
                      for t in r[2]] if False else None
            expect = []
            for s2, d2, toks in sorted(rows, key=lambda x: x[1]):
                if s2 == src:
                    expect.extend(toks)
            got = [t for c in chunks for t in c["tokens"]]
            assert got == expect
        # the straddling doc (doc 1: tokens 60..109 of s0) splits 40/10
        s0 = by_src["s0"]
        assert s0[0]["n_pieces"] == 2  # doc0 (60) + first 40 of doc1
        assert s0[0]["tokens"][60] == "d1_0"
        assert s0[1]["tokens"][0] == "d1_40"


class TestCountMin:
    def test_estimate_upper_bounds_and_merge(self, spark):
        from txtlogparser_spark.operators.sketches import (
            cms_build,
            cms_estimate,
            cms_merge,
        )

        rows = [(w,) for w in
                ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + [f"rare{i}" for i in range(30)]]
        df = spark.createDataFrame(rows, ["item"])
        sk = cms_build(df, depth=4, width=64)
        est = {
            r["item"]: r["est_n"]
            for r in cms_estimate(sk, df.select("item").distinct(), depth=4, width=64).collect()
        }
        true = {"a": 50, "b": 20, "c": 5}
        for w, t in true.items():
            assert est[w] >= t  # CMS never underestimates
        # with 105 items in 4x64 cells the heavy keys are near-exact
        assert est["a"] <= 50 + 35
        # mergeability: sketch(x) + sketch(y) == sketch(x union y)
        half1 = spark.createDataFrame(rows[:50], ["item"])
        half2 = spark.createDataFrame(rows[50:], ["item"])
        merged = cms_merge(
            cms_build(half1, depth=4, width=64), cms_build(half2, depth=4, width=64)
        )
        whole = cms_build(df, depth=4, width=64)
        assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))

    def test_sketch_size_bounded(self, spark):
        from txtlogparser_spark.operators.sketches import cms_build

        df = spark.range(5000).select(
            F.concat(F.lit("k"), F.col("id")).alias("item")
        )
        sk = cms_build(df, depth=3, width=32)
        assert sk.count() <= 3 * 32  # cells, not keys


class TestIncrementalProbe:
    def test_probe_finds_cross_shard_dups(self, spark):
        from txtlogparser_spark.operators.dedup import (
            band_table,
            minhash_signatures,
            probe_lsh_index,
            shingle_table,
        )

        base = [
            (0, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "completely different content about spark query optimization today"),
            (4, "one two three four five six seven eight nine ten eleven twelve"),
            # new shard: 1 = exact dup of 0, 3 = near-dup of 0, 5 = novel
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (3, "the quick brown fox jumps over the lazy dog near the river bend"),
            (5, "totally novel text with no overlap whatsoever in any shingle here"),
        ]
        docs = spark.createDataFrame(base, ["doc_id", "text"])
        idx = docs.where("doc_id % 2 = 0")
        new = docs.where("doc_id % 2 = 1")
        index = band_table(minhash_signatures(shingle_table(idx)))
        got = {
            (r["new_id"], r["index_id"])
            for r in probe_lsh_index(index, new).collect()
        }
        assert (1, 0) in got  # exact dup always collides
        assert not any(n == 5 for n, _ in got)  # novel doc stays clean
        # index side was never compared against itself
        assert all(n % 2 == 1 and i % 2 == 0 for n, i in got)


class TestQuotaSample:
    def test_exact_quota_and_determinism(self, spark):
        from txtlogparser_spark.operators.sampling import quota_sample

        rows = [(i, f"s{i % 3}") for i in range(300)] + [(1000, "tiny")]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        got = quota_sample(df, 7).groupBy("source").count().collect()
        counts = {r["source"]: r["count"] for r in got}
        assert counts == {"s0": 7, "s1": 7, "s2": 7, "tiny": 1}
        a = {r["doc_id"] for r in quota_sample(df, 7).collect()}
        b = {r["doc_id"] for r in quota_sample(df.repartition(13), 7).collect()}
        assert a == b

    def test_hot_group_prefilter_bounds_window_input(self, spark):
        """Skew fixture (90% one source): the selected set equals the
        naive full-group hash window, but the exact window only ever
        sees the hash-threshold survivors — no task receives the whole
        hot group (round-3 VERDICT #2)."""
        import hashlib

        from txtlogparser_spark.operators.sampling import quota_sample

        hot = [(i, "hot") for i in range(9000)]
        cold = [(100000 + i, f"s{i % 3}") for i in range(1000)]
        df = spark.createDataFrame(hot + cold, ["doc_id", "source"])
        out = quota_sample(df, 10)

        def hx(i: int) -> str:
            return "0" + hashlib.md5(f"quota-v1:{i}".encode()).hexdigest()[:8]

        groups: dict = {}
        for i, s in hot + cold:
            groups.setdefault(s, []).append(i)
        expect = {
            (s, i)
            for s, ids in groups.items()
            for i in sorted(ids, key=lambda x: (hx(x), x))[:10]
        }
        got = {(r["source"], r["doc_id"]) for r in out.collect()}
        assert got == expect

        # the default margin's threshold keeps a tiny prefix of the hot
        # group: replay the prefilter (md5 is fixed) and bound it
        thr = format(int(min(1.0, 4.0 * 10 / 9000) * (1 << 32)), "09x")
        survivors = sum(1 for i, _ in hot if hx(i) < thr)
        assert 10 <= survivors < 9000 * 0.05
        # and the executed plan windows over a _qthr-filtered child,
        # not the raw input
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_qthr" in plan

    def test_null_group_is_its_own_quota_group(self, spark):
        """Review finding: a NULL group value crashed the driver-side
        sorted(counts.items()) and would have vanished through the
        equi-join anyway. NULL is a group like any other (matching the
        exact window's partitionBy semantics)."""
        from txtlogparser_spark.operators.sampling import quota_sample

        rows = [(i, "a") for i in range(40)] + [(1000 + i, None) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = quota_sample(df, 5).groupBy("source").count().collect()
        counts = {r["source"]: r["count"] for r in got}
        assert counts == {"a": 5, None: 5}
        a = {r["doc_id"] for r in quota_sample(df, 5).collect()}
        b = {r["doc_id"] for r in quota_sample(df.repartition(7), 5).collect()}
        assert a == b


class TestEpochShuffle:
    def test_permutation_matches_python_model_and_partitioning(self, spark):
        """epoch_pos is a 0..n-1 permutation following (md5(seed:id), id),
        identical to a pure-Python sort, identical across physical
        partitionings, and different per seed."""
        import hashlib

        from txtlogparser_spark.operators.sampling import epoch_shuffle

        rows = [(i, f"s{i % 3}") for i in range(97)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])

        def model(seed):
            order = sorted(
                (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i)
                for i, _ in rows
            )
            return {i: pos for pos, (_, i) in enumerate(order)}

        got = {
            r["doc_id"]: r["epoch_pos"]
            for r in epoch_shuffle(df, seed="epoch-0").collect()
        }
        assert got == model("epoch-0")
        assert sorted(got.values()) == list(range(97))

        rep = {
            r["doc_id"]: r["epoch_pos"]
            for r in epoch_shuffle(df.repartition(13), seed="epoch-0").collect()
        }
        assert rep == got

        other = {
            r["doc_id"]: r["epoch_pos"]
            for r in epoch_shuffle(df, seed="epoch-1").collect()
        }
        assert other == model("epoch-1")
        assert other != got


class TestCompaction:
    def test_write_compacted_reduces_files_and_sorts(self, spark, tmp_path):
        from txtlogparser_spark.sources.compact import write_compacted
        import glob

        # 64 slivers of one logical dataset — the small-file spray shape
        df = (
            spark.range(20000)
            .withColumnRenamed("id", "doc_id")
            .withColumn("source", F.concat(F.lit("s"), (F.col("doc_id") % 3)))
            .repartition(64)
        )
        naive = str(tmp_path / "naive")
        df.write.partitionBy("source").parquet(naive)
        n_naive = len(glob.glob(f"{naive}/source=*/*.parquet"))

        compacted = str(tmp_path / "compacted")
        write_compacted(
            df, compacted, partition_by=["source"], sort_within=["doc_id"]
        )
        files = glob.glob(f"{compacted}/source=*/*.parquet")
        assert len(files) < n_naive / 4  # rebalance collapsed the spray
        # content identical
        a = sorted(r["doc_id"] for r in spark.read.parquet(compacted).collect())
        assert a == list(range(20000))
        # per-file sortedness => selective row-group min/max stats
        import pyarrow.parquet as pq

        for f in files[:4]:
            col = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
            assert col == sorted(col)


class TestQualityChecks:
    def test_checks_one_pass_and_counts(self, spark):
        from txtlogparser_spark.operators.quality_checks import (
            accepted_values,
            in_range,
            matches_regex,
            not_null,
            run_checks,
            unique,
        )

        rows = [
            (0, "x", "en"), (1, "y", "en"), (1, None, "xx"), (None, "z", "en"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = {
            r["check"]: (r["violations"], r["passed"])
            for r in run_checks(
                df,
                [
                    not_null("doc_id"),
                    unique("doc_id"),
                    not_null("text"),
                    accepted_values("lang", ["en"]),
                    in_range("doc_id", 0, 100),
                    matches_regex("lang", "^[a-z]{2}$"),
                ],
            ).collect()
        }
        assert out["not_null(doc_id)"] == (1, False)
        # count_distinct ignores nulls: 4 rows - 2 distinct non-null = 2
        assert out["unique(doc_id)"] == (2, False)
        assert out["not_null(text)"] == (1, False)
        assert out["accepted_values(lang)"] == (1, False)
        assert out["in_range(doc_id,0,100)"][1] is True or out["in_range(doc_id,0,100)"][0] == 0
        assert out["matches_regex(lang)"] == (0, True)


class TestReviewRegressions:
    """Pins for the round-3 code-review findings."""

    def test_assemble_skips_zero_length_boundary_doc(self, spark):
        from txtlogparser_spark.operators.packing import assemble_chunks

        rows = [
            ("s", 0, ["a", "b", "c", "d"]),
            ("s", 1, []),  # lands exactly on the chunk cut at stream end
        ]
        df = spark.createDataFrame(rows, "source string, doc_id long, tokens array<string>")
        out = assemble_chunks(df, capacity=4).collect()
        assert [(r["chunk_id"], r["tokens"], r["n_pieces"]) for r in out] == [
            (0, ["a", "b", "c", "d"], 1)
        ]  # no phantom empty chunk 1

    def test_greedy_pack_nonstring_part_col(self, spark):
        from txtlogparser_spark.operators.packing import greedy_pack

        df = spark.createDataFrame(
            [(7, 0, 10), (7, 1, 10)], "source long, doc_id long, n_tok long"
        )
        got = greedy_pack(df, capacity=15).orderBy("doc_id").collect()
        assert [r["bin_id"] for r in got] == [0, 1]
        assert got[0]["source"] == 7

    def test_quality_check_regex_backslash_name(self, spark):
        from txtlogparser_spark.operators.quality_checks import (
            matches_regex,
            run_checks,
        )

        df = spark.createDataFrame([("src1",), ("bad",)], ["source"])
        out = run_checks(df, [matches_regex("source", r"^src\d+$")]).collect()
        assert len(out) == 1
        assert out[0]["check"] == r"matches_regex(source)"
        assert out[0]["violations"] == 1 and not out[0]["passed"]

    def test_cms_estimate_set_semantics(self, spark):
        from txtlogparser_spark.operators.sketches import cms_build, cms_estimate

        df = spark.createDataFrame([("a",), ("a",), ("b",)], ["item"])
        sk = cms_build(df, depth=2, width=8)
        # duplicate query rows + an extra column: one row per distinct item
        q = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], ["item", "qid"]
        )
        out = cms_estimate(sk, q, depth=2, width=8).collect()
        assert sorted((r["item"], r["est_n"]) for r in out) == [("a", 2), ("b", 1)]

    def test_dedup_stream_null_rows_do_not_poison_batch(self, spark, tmp_path):
        from txtlogparser_spark.streaming.stateful import dedup_stream

        src = str(tmp_path / "in")
        spark.createDataFrame(
            [(0, "alpha"), (None, "alpha"), (1, None)],
            "doc_id long, text string",
        ).coalesce(1).write.parquet(src)
        q = (
            dedup_stream(spark.readStream.schema("doc_id long, text string").parquet(src))
            .writeStream.format("memory")
            .queryName("dedup_nulls")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select * from dedup_nulls").collect()
        assert [(r["digest"] is not None, r["keeper_doc_id"]) for r in got] == [(True, 0)]

    def test_zero_norm_vectors_never_rank(self, spark):
        """A zero embedding has undefined cosine (0/0=NaN ranks FIRST
        under desc) — the top-k entry points must exclude it."""
        import numpy as np
        from txtlogparser_spark.operators.similarity import brute_force_topk

        rng = np.random.default_rng(7)
        corpus = [(i, [float(x) for x in rng.normal(size=4)]) for i in range(20)]
        corpus.append((99, [0.0, 0.0, 0.0, 0.0]))
        cdf = spark.createDataFrame(corpus, "vec_id long, v array<float>")
        qdf = spark.createDataFrame(
            [(0, corpus[0][1]), (1, [0.0, 0.0, 0.0, 0.0])],
            "query_id long, qv array<float>",
        )
        out = brute_force_topk(qdf, cdf, k=3).collect()
        assert all(r["neighbor_id"] != 99 for r in out)  # zero vec never a hit
        assert all(r["query_id"] != 1 for r in out)  # zero query returns nothing
        assert [r["rank"] for r in out if r["query_id"] == 0] == [1, 2, 3]

    def test_band_size_divisibility_guard(self, spark):
        from txtlogparser_spark.operators.dedup import band_table

        sig = spark.createDataFrame([(1, ["00=a"])], "doc_id long, sig array<string>")
        import pytest as _pt

        with _pt.raises(ValueError, match="divisible"):
            band_table(sig, num_hashes=16, band_size=5)


class TestSemanticDedup:
    def test_equals_brute_force_within_cells(self, spark):
        """Blocked pairs must equal the all-pairs cosine filter
        restricted to same-cell pairs (the blocking trade is EXACTLY
        cross-cell misses, nothing else)."""
        import numpy as np
        from txtlogparser_spark.operators.similarity import (
            ivf_assign,
            ivf_centroids,
            semantic_dedup_pairs,
        )

        rng = np.random.default_rng(3)
        vecs = [[float(x) for x in rng.normal(size=4)] for _ in range(40)]
        vecs[7] = [x * 1.01 + 0.001 for x in vecs[3]]  # a true near-dup pair
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "vec_id long, v array<double>"
        )
        got = {
            (r["vec_a"], r["vec_b"]): r["sim_r"]
            for r in semantic_dedup_pairs(df, n_cells=4, threshold=0.9).collect()
        }
        # python model
        cents_rows = ivf_centroids(df, 4)
        cents = [np.array(c) for c in cents_rows]

        def cell(v):
            v = np.array(v)
            sims = [
                float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
                for c in cents
            ]
            best = max(range(4), key=lambda i: (sims[i], -i))
            return best

        expect = {}
        for i in range(40):
            for j in range(i + 1, 40):
                if cell(vecs[i]) != cell(vecs[j]):
                    continue
                a, b = np.array(vecs[i]), np.array(vecs[j])
                s = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                if s >= 0.9:
                    expect[(i, j)] = round(s, 4)
        assert got == expect
        assert (3, 7) in got  # the planted near-dup shares a cell (same direction)

    def test_blocked_pairs_grid_decomposition_is_result_identical(self, spark):
        """One dominant block forced through the G>1 grid path must
        return EXACTLY the plain self-join's pairs (round-3 VERDICT #4:
        hot-block protection without recall change)."""
        import numpy as np
        from txtlogparser_spark.operators.similarity import blocked_cosine_pairs

        rng = np.random.default_rng(11)
        rows = [
            (i, "hot" if i < 90 else f"b{i % 3}", [float(x) for x in rng.normal(size=4)])
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "vec_id long, label string, v array<double>")

        def pairs(max_block_rows):
            return {
                (r["vec_a"], r["vec_b"], round(r["sim"], 4))
                for r in blocked_cosine_pairs(
                    df, block_col="label", threshold=0.2,
                    max_block_rows=max_block_rows,
                ).collect()
            }

        plain = pairs(10_000)  # G == 1: plain self-join
        grid = pairs(20)  # G == ceil(90/20) == 5: grid path
        assert grid == plain and len(plain) > 0

    def test_blocked_pairs_budget_guard_raises(self, spark):
        from txtlogparser_spark.operators.similarity import blocked_cosine_pairs
        import pytest as _pt

        df = spark.createDataFrame(
            [(i, "one", [1.0, 0.0]) for i in range(100)],
            "vec_id long, label string, v array<double>",
        )
        with _pt.raises(RuntimeError, match="budget"):
            blocked_cosine_pairs(
                df, block_col="label", threshold=0.5, max_total_pairs=100
            )

    def test_semantic_dedup_hot_cell_grid_path_unchanged(self, spark):
        """semantic_dedup_pairs with a tiny max_cell_rows (forcing the
        grid decomposition) returns the identical pair set."""
        import numpy as np
        from txtlogparser_spark.operators.similarity import semantic_dedup_pairs

        rng = np.random.default_rng(5)
        vecs = [[float(x) for x in rng.normal(size=4)] for _ in range(60)]
        vecs[9] = [x * 1.02 for x in vecs[4]]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "vec_id long, v array<double>"
        )

        def run(cap):
            return {
                (r["vec_a"], r["vec_b"], r["sim_r"])
                for r in semantic_dedup_pairs(
                    df, n_cells=4, threshold=0.9, max_cell_rows=cap
                ).collect()
            }

        assert run(100_000) == run(5) and (4, 9, 1.0) in run(5)

    def test_components_nonconvergence_raises(self, spark):
        """A chain longer than max_iter hops must fail loudly, not
        return a silently split cluster (review finding)."""
        from txtlogparser_spark.operators.dedup import duplicate_components

        # the module's earlier tests leave persisted frames behind;
        # this test's iterative loop needs the driver heap headroom
        spark.catalog.clearCache()
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
        )
        import pytest as _pt

        with _pt.raises(RuntimeError, match="did not converge"):
            duplicate_components(pairs, max_iter=2)
        # and with enough iterations the same chain is ONE component —
        # at the DEFAULT checkpoint cadence (an earlier default of 10
        # let the per-round plan doubling OOM the driver before the
        # first truncation)
        got = duplicate_components(pairs, max_iter=20).collect()
        assert {r["group_rep"] for r in got} == {0}

    def test_components_chain_converges_in_log_rounds(self, spark):
        """Pointer jumping (round-3 VERDICT #7): a 64-hop duplicate
        chain converges within ~log2(64)+slack rounds — without the
        shortcut this needs ~64 rounds and max_iter=10 would raise."""
        from txtlogparser_spark.operators.dedup import duplicate_components

        spark.catalog.clearCache()
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], "doc_a long, doc_b long"
        )
        got = duplicate_components(pairs, max_iter=10).collect()
        assert len(got) == 65
        assert {r["group_rep"] for r in got} == {0}


class TestTokenBudgetMix:
    """token_budget_mix: per-source TOKEN-budget selection in
    deterministic hash order (the trainer-facing mixing step), with the
    quota_sample-style hash-threshold prefilter bounding the exact
    cumulative window; temperature_budgets: the XLM-R/mT5 multinomial
    temperature weighting that produces the budgets dict."""

    SALT = "budget-v1"

    def _rows(self):
        # deterministic variable-length docs across three sources
        return [
            (i, f"s{i % 3}", 10 + (i * 7) % 50)  # n_tok in [10, 59]
            for i in range(300)
        ]

    def _model(self, rows, budgets, salt=SALT):
        import hashlib

        sel = set()
        groups = {}
        for doc_id, src, ntok in rows:
            groups.setdefault(src, []).append((doc_id, ntok))
        for s, docs in groups.items():
            b = budgets.get(s, 0)
            if b <= 0:
                continue
            cum = 0
            order = sorted(
                docs,
                key=lambda x: (
                    "0" + hashlib.md5(f"{salt}:{x[0]}".encode()).hexdigest()[:8],
                    x[0],
                ),
            )
            for d, nt in order:
                if cum < b:
                    sel.add(d)
                    cum += nt
        return sel

    def test_matches_model_and_deterministic(self, spark):
        from txtlogparser_spark.operators.sampling import token_budget_mix

        rows = self._rows()
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
        budgets = {"s0": 400, "s1": 90, "s2": 10 ** 9}  # s2 > total: keep all
        got = {r["doc_id"] for r in token_budget_mix(df, budgets).collect()}
        assert got == self._model(rows, budgets)
        # s2 kept whole
        assert len([1 for i, s, _ in rows if s == "s2"]) == len(
            [d for d in got if rows[d][1] == "s2"]
        )
        # determinism across partitionings
        again = {
            r["doc_id"]
            for r in token_budget_mix(df.repartition(13), budgets).collect()
        }
        assert got == again

    def test_budget_exact_to_one_doc(self, spark):
        from txtlogparser_spark.operators.sampling import token_budget_mix

        rows = self._rows()
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
        budgets = {"s0": 400}
        out = token_budget_mix(df, budgets).collect()
        toks = sorted((r["n_tok"] for r in out), reverse=True)
        total = sum(toks)
        # budget met, overshoot bounded by the crossing document
        assert total >= 400 and total - toks[0] < 400
        # absent sources contribute nothing
        assert {r["source"] for r in out} == {"s0"}

    def test_zero_and_empty_budgets(self, spark):
        from txtlogparser_spark.operators.sampling import token_budget_mix

        df = spark.createDataFrame(
            self._rows(), ["doc_id", "source", "n_tok"]
        )
        assert token_budget_mix(df, {"s0": 0}).count() == 0
        assert token_budget_mix(df, {}).count() == 0
        with pytest.raises(ValueError):
            token_budget_mix(df, {"s0": -1})

    def test_duckdb_parity(self, spark):
        import duckdb

        from txtlogparser_spark.operators.sampling import token_budget_mix

        rows = self._rows()
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
        budgets = {"s0": 400, "s1": 90}
        got = {r["doc_id"] for r in token_budget_mix(df, budgets).collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE docs (doc_id BIGINT, source VARCHAR, n_tok BIGINT)"
        )
        con.executemany("INSERT INTO docs VALUES (?, ?, ?)", rows)
        con.execute(
            "CREATE TABLE budgets (source VARCHAR, budget BIGINT)"
        )
        con.executemany(
            "INSERT INTO budgets VALUES (?, ?)", sorted(budgets.items())
        )
        want = {
            r[0]
            for r in con.execute(
                """
                SELECT doc_id FROM (
                  SELECT d.doc_id, b.budget,
                    SUM(d.n_tok) OVER (
                      PARTITION BY d.source
                      ORDER BY '0' || substr(md5('budget-v1:' ||
                        CAST(d.doc_id AS VARCHAR)), 1, 8), d.doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) - d.n_tok AS cum_before
                  FROM docs d JOIN budgets b USING (source)
                ) WHERE cum_before < budget
                """
            ).fetchall()
        }
        assert got == want

    def test_hot_source_prefilter_bounds_window_input(self, spark):
        """90%-hot-source fixture with a small budget: selected set
        equals the naive full-group window, while the executed plan
        windows over a _bthr-filtered child — no task receives the
        whole hot group."""
        import hashlib

        from txtlogparser_spark.operators.sampling import token_budget_mix

        hot = [(i, "hot", 20) for i in range(9000)]
        cold = [(100000 + i, f"s{i % 3}", 20) for i in range(1000)]
        rows = hot + cold
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
        budgets = {"hot": 200, "s0": 100}
        out = token_budget_mix(df, budgets)
        got = {r["doc_id"] for r in out.collect()}
        assert got == self._model(rows, budgets)

        # replay the default-margin prefilter: tiny prefix of hot kept
        thr = format(
            int(min(1.0, 4.0 * 200 / (9000 * 20)) * (1 << 32)), "09x"
        )
        def hx(i):
            return "0" + hashlib.md5(f"budget-v1:{i}".encode()).hexdigest()[:8]
        survivors = sum(1 for i, _, _ in hot if hx(i) < thr)
        assert 0 < survivors < 9000 * 0.05
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_bthr" in plan

    def test_heavy_tailed_group_few_huge_docs(self, spark):
        """Review finding: a source whose tokens sit in a few huge
        documents must not exhaust the widen loop — the 1/count floor
        keeps expected survivor ROWS >= margin even when the token-rate
        term rounds to zero rows."""
        from txtlogparser_spark.operators.sampling import token_budget_mix

        rows = [(i, "whale", 10**8) for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
        out = token_budget_mix(df, {"whale": 1000}).collect()
        # budget crossed by the first hash-ordered doc alone
        assert len(out) == 1
        assert {r["doc_id"] for r in out} == self._model(rows, {"whale": 1000})

    def test_null_token_counts(self, spark):
        """Review finding: all-NULL and partially-NULL tok_col must not
        crash the stats dim; NULL tokens count as 0 (selected for free
        when reached, never crossing the budget)."""
        from txtlogparser_spark.operators.sampling import token_budget_mix

        rows = [(1, "a", 50), (2, "a", None), (3, "a", 60), (4, "b", None)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
        # source b (all NULL) simply ignored without a budget entry
        out = token_budget_mix(df, {"a": 10**6}).collect()
        assert {r["doc_id"] for r in out} == {1, 2, 3}
        # and selectable for free when budgeted (0 tokens never cross)
        outb = token_budget_mix(df, {"b": 5}).collect()
        assert {r["doc_id"] for r in outb} == {4}

    def test_temperature_budgets(self):
        from txtlogparser_spark.operators.sampling import temperature_budgets

        totals = {"web": 900, "code": 90, "books": 10}
        # tau=1: natural proportions
        nat = temperature_budgets(totals, 100, tau=1.0)
        assert nat == {"web": 90, "code": 9, "books": 1}
        # tau=0: uniform weights, capped at each source's actual total
        flat = temperature_budgets(totals, 300, tau=0.0)
        assert flat == {"web": 100, "code": 90, "books": 10}
        # caps: budget never exceeds the source total
        assert temperature_budgets(totals, 10**6, tau=1.0) == totals
        # zero-count sources get 0; validation
        assert temperature_budgets({"a": 0, "b": 10}, 100)["a"] == 0
        with pytest.raises(ValueError):
            temperature_budgets(totals, 100, tau=-1)
        with pytest.raises(ValueError):
            temperature_budgets(totals, -5)
        # review finding: realistic token totals with large tau must
        # not overflow (log-space weights)
        big = temperature_budgets(
            {"web": 10**12, "code": 10**9}, 10**9, tau=40.0
        )
        assert big["web"] == 10**9 and big["code"] == 0


class TestGopherFlags:
    """gopher_flags (functions/text.py): the published Gopher/
    MassiveText quality rule set as pure-Catalyst boolean columns.
    Value oracle = DuckDB list-function replay + per-rule pinned
    fixtures (registry 50-slot window full -> pytest-oracled)."""

    def _flag_row(self, spark, text, **kw):
        from txtlogparser_spark.functions.text import gopher_flags

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        flags = gopher_flags("text", **kw)
        row = df.select(
            *[c.alias(k) for k, c in flags.items()]
        ).collect()[0]
        return row.asDict()

    GOOD = (
        "the quick brown fox jumps over the lazy dog and then it have "
        "to be going on with many more plain words that keep the "
        "document long enough to pass the minimum word count rule so "
        "we simply continue adding ordinary english words until fifty "
        "of them exist in this single test document right about here "
        "now done"
    )

    def test_good_doc_passes(self, spark):
        row = self._flag_row(spark, self.GOOD)
        assert row["gopher_pass"] is True
        assert all(v is True for v in row.values())

    def test_each_rule_fires_individually(self, spark):
        # too short
        assert self._flag_row(spark, "tiny doc")["words_ok"] is False
        # degenerate mean word length (single letters)
        r = self._flag_row(spark, " ".join(["a"] * 60))
        assert r["mean_word_len_ok"] is False
        # symbol spam
        r = self._flag_row(spark, self.GOOD + " " + "# # # # # # # # # #" * 2)
        assert r["symbol_ratio_ok"] is False
        # bullet-led lines
        bullets = "\n".join(f"- item {i}" for i in range(20))
        assert self._flag_row(spark, bullets)["bullet_lines_ok"] is False
        # ellipsis-terminated lines
        dots = "\n".join(f"line {i}..." for i in range(10))
        assert self._flag_row(spark, dots)["ellipsis_lines_ok"] is False
        # numeric soup fails the alpha-word rule
        nums = " ".join(str(i) for i in range(80))
        assert self._flag_row(spark, nums)["alpha_words_ok"] is False
        # no required function words
        greek = " ".join(["alpha beta gamma delta"] * 20)
        assert self._flag_row(spark, greek)["stopwords_ok"] is False

    def test_newline_wrapped_doc_counts_words(self, spark):
        """Review finding: hard-wrapped documents must tokenize on
        WHITESPACE — a 55-word doc wrapped into lines of 5 words has 55
        words, not 45 newline-glued tokens."""
        words = [f"word{i:02d}" for i in range(55)]
        wrapped = "\n".join(
            " ".join(words[i : i + 5]) for i in range(0, 55, 5)
        )
        wrapped += " the of"  # satisfy the stopword rule
        row = self._flag_row(spark, wrapped)
        assert row["words_ok"] is True
        assert row["mean_word_len_ok"] is True
        assert row["gopher_pass"] is True

    def test_null_text_definite_booleans(self, spark):
        """Review finding: NULL text must produce definite False flags
        (coalesced to ''), not NULLs that vanish from reject counts."""
        row = self._flag_row(spark, None)
        assert row["gopher_pass"] is False
        assert all(isinstance(v, bool) for v in row.values())

    def test_thresholds_are_knobs(self, spark):
        assert (
            self._flag_row(spark, "five words right here now", min_words=5)[
                "words_ok"
            ]
            is True
        )

    def test_duckdb_parity(self, spark):
        import duckdb

        from txtlogparser_spark.functions.text import gopher_flags

        docs = [
            (1, self.GOOD),
            (2, "tiny doc"),
            (3, " ".join(["a"] * 60)),
            (4, "\n".join(f"- item {i}" for i in range(20))),
            (5, "\n".join(f"line {i}..." for i in range(10))),
            (6, " ".join(str(i) for i in range(80))),
            (7, " ".join(["alpha beta gamma delta"] * 20)),
            (8, self.GOOD + " # ellipsis… trailing…"),
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        flags = gopher_flags("text")
        got = {
            r["doc_id"]: tuple(r[k] for k in flags)
            for r in df.select(
                "doc_id", *[c.alias(k) for k, c in flags.items()]
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
        rows = con.execute(
            r"""
            WITH b AS (
              SELECT doc_id, text AS t,
                     regexp_split_to_array(text, '\s+') AS ws,
                     string_split(text, chr(10)) AS ls
              FROM docs
            )
            SELECT doc_id,
              len(ws) BETWEEN 50 AND 100000 AS words_ok,
              (list_sum(list_transform(ws, w -> length(w))) * 1.0 / len(ws))
                BETWEEN 3 AND 10 AS mean_word_len_ok,
              (len(regexp_extract_all(t, '#'))
               + len(regexp_extract_all(t, '\.\.\.'))
               + len(regexp_extract_all(t, '…')))
                <= 0.1 * len(ws) AS symbol_ratio_ok,
              len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•]')))
                * 1.0 / len(ls) <= 0.9 AS bullet_lines_ok,
              len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                * 1.0 / len(ls) <= 0.3 AS ellipsis_lines_ok,
              len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
                * 1.0 / len(ws) >= 0.8 AS alpha_words_ok,
              len(list_filter(
                    ['the','be','to','of','and','that','have','with'],
                    s -> list_contains(list_transform(ws, w -> lower(w)), s)))
                >= 2 AS stopwords_ok
            FROM b
            """
        ).fetchall()
        want = {
            r[0]: tuple(bool(v) for v in r[1:]) + (all(bool(v) for v in r[1:]),)
            for r in rows
        }
        assert got == want


class TestShardPlan:
    """shard_plan: token-balanced contiguous-slice sharding
    (operators/packing.py::shard_plan)."""

    def _docs(self, spark, n=400, seed=7):
        import random

        rnd = random.Random(seed)
        rows = [(i, rnd.randint(1, 500)) for i in range(n)]
        return rows, spark.createDataFrame(rows, "doc_id long, n_tok long")

    def test_balance_and_membership(self, spark):
        from txtlogparser_spark.operators.packing import shard_plan

        rows, df = self._docs(spark)
        n_shards = 8
        out = shard_plan(df, n_shards).collect()
        assert len(out) == len(rows)
        total = sum(t for _, t in rows)
        maxlen = max(t for _, t in rows)
        per = {}
        for r in out:
            assert 0 <= r["shard"] < n_shards
            per.setdefault(r["shard"], 0)
            per[r["shard"]] += r["n_tok"]
        # every shard's token total within one max doc length of ideal
        ideal = total / n_shards
        for s, tok in per.items():
            assert abs(tok - ideal) <= maxlen, (s, tok, ideal, maxlen)

    def test_contiguous_in_hash_order_and_flat_replay(self, spark):
        """shard is monotone in tok_before (contiguous slices), and the
        bucket-decomposed cumsum equals the flat single-window replay."""
        import hashlib

        from txtlogparser_spark.operators.packing import shard_plan

        rows, df = self._docs(spark, n=300)
        n_shards = 5
        out = {r["doc_id"]: (r["tok_before"], r["shard"])
               for r in shard_plan(df, n_shards).collect()}
        # flat replay in plain Python
        hh = {i: hashlib.md5(f"shard-v1:{i}".encode()).hexdigest()
              for i, _ in rows}
        order = sorted(rows, key=lambda it: (hh[it[0]], it[0]))
        total = sum(t for _, t in rows)
        run = 0
        prev_shard = 0
        for i, t in order:
            want_shard = (run * n_shards) // total
            assert out[i] == (run, want_shard), (i, out[i], (run, want_shard))
            assert want_shard >= prev_shard  # contiguity / monotone
            prev_shard = want_shard
            run += t

    def test_bucket_invariance_and_zero_total(self, spark):
        from txtlogparser_spark.operators.packing import shard_plan

        _, df = self._docs(spark, n=150)
        a = {(r["doc_id"], r["shard"])
             for r in shard_plan(df, 4, bucket_hex=1).collect()}
        b = {(r["doc_id"], r["shard"])
             for r in shard_plan(df, 4, bucket_hex=3).collect()}
        assert a == b
        z = spark.createDataFrame(
            [(1, 0), (2, 0)], "doc_id long, n_tok long"
        )
        zs = shard_plan(z, 4).collect()
        assert {r["shard"] for r in zs} == {0}

    def test_no_fact_table_single_partition(self, spark):
        """The fact-table cumsum must decompose over hash buckets — the
        only SinglePartition exchanges allowed are the tiny dim/scalar
        aggregates (ordered_partition_dim class)."""
        from txtlogparser_spark.operators.packing import shard_plan

        _, df = self._docs(spark, n=200)
        plan = shard_plan(df, 8)._jdf.queryExecution().executedPlan().toString()
        # a flat global window would show 'Window' below an
        # 'Exchange SinglePartition' feeding the full fact scan; our
        # windows are partitioned by _bkt
        assert "partitionBy" not in plan  # sanity: physical plan text
        for line in plan.splitlines():
            if "Window" in line and "_local_end" in line:
                assert "_bkt" in line, line

    def test_invalid_n_shards(self, spark):
        import pytest as _pytest

        from txtlogparser_spark.operators.packing import shard_plan

        _, df = self._docs(spark, n=5)
        with _pytest.raises(ValueError):
            shard_plan(df, 0)


class TestFuzzyDedupCorpus:
    """fuzzy_dedup_corpus (driver query): whole-corpus keep/drop table
    from the minhash->jaccard->components chain."""

    def test_decision_table_consistency(self, spark):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "entry_mod_fdc", "/root/repo/__spark_entry__.py"
        )
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        sf = "/root/testdata/sf0.001"
        rows = m.q_fuzzy_dedup_corpus(spark, sf).collect()
        docs = spark.read.parquet(f"{sf}/documents.parquet").count()
        assert len(rows) == docs  # never drops/duplicates corpus rows
        groups = {}
        for r in rows:
            assert (r["keeper_id"] == r["doc_id"]) == (not r["is_dup"])
            groups.setdefault(r["keeper_id"], []).append(
                (r["doc_id"], r["group_size"])
            )
        for keeper, members in groups.items():
            ids = sorted(i for i, _ in members)
            sizes = {s for _, s in members}
            assert keeper == ids[0]  # keeper = smallest member id
            assert sizes == {len(members)}  # group_size consistent
        # parity with the standalone components query on the same SF
        comp = {
            (r["doc_id"], r["group_rep"], r["group_size"])
            for r in m.q_dedup_groups(spark, sf).collect()
        }
        mine = {
            (r["doc_id"], r["keeper_id"], r["group_size"])
            for r in rows
            if r["group_size"] > 1 or r["is_dup"]
        }
        # every multi-doc component matches dedup_groups exactly
        assert {c for c in comp if c[2] > 1} == {c for c in mine if c[2] > 1}


class TestCurriculumOrder:
    def test_order_and_phases_match_model(self, spark):
        import hashlib

        from txtlogparser_spark.operators.sampling import curriculum_order

        rows = [(i, float(s)) for i, s in enumerate(
            [0.9, 0.1, 0.5, 0.95, 0.2, 0.55, 0.91, 0.15, 0.52]
        )]
        df = spark.createDataFrame(rows, ["doc_id", "score"])
        got = {
            r["doc_id"]: (r["phase"], r["curriculum_pos"])
            for r in curriculum_order(df, "score", n_phases=3).collect()
        }
        # model: grid cells -> ntile-by-first-rank buckets -> phase
        import math
        cells = {i: math.floor(s / 0.01) for i, s in rows}
        hist = {}
        for c in cells.values():
            hist[c] = hist.get(c, 0) + 1
        tot = len(rows)
        cum, bk = 0, {}
        for c in sorted(hist):
            bk[c] = 1 + (cum * 3) // tot
            cum += hist[c]
        phase = {i: 3 + 1 - bk[cells[i]] for i, _ in rows}
        order = sorted(
            (ph, hashlib.md5(f"curr-0:{i}".encode()).hexdigest(), i)
            for i, ph in phase.items()
        )
        want = {
            i: (phase[i], pos) for pos, (_p, _h, i) in enumerate(order)
        }
        assert got == want

    def test_highest_scores_phase_one(self, spark):
        from txtlogparser_spark.operators.sampling import curriculum_order

        rows = [(i, 0.1 + 0.2 * (i % 3)) for i in range(30)]
        df = spark.createDataFrame(rows, ["doc_id", "score"])
        out = curriculum_order(df, "score", n_phases=3).collect()
        by_phase = {}
        for r in out:
            by_phase.setdefault(r["phase"], []).append(r)
        # phase 1 holds the top-score stratum, and positions are
        # contiguous blocks phase by phase
        s1 = {r["doc_id"] % 3 for r in by_phase[1]}
        assert s1 == {2}
        assert max(r["curriculum_pos"] for r in by_phase[1]) < min(
            r["curriculum_pos"] for r in by_phase[2]
        )
        assert sorted(r["curriculum_pos"] for r in out) == list(range(30))

    def test_no_fact_table_single_partition(self, spark):
        """Every SinglePartition exchange in the plan must be a
        width-bounded dim funnel (child aggregate keyed on a `_bkt`
        convention column — the grid-histogram cells and the bucket
        offsets) or a keyless scalar, never fact rows (the
        explain_audit killer/benign classification)."""
        import re

        from txtlogparser_spark.operators.sampling import curriculum_order

        df = spark.createDataFrame(
            [(i, float(i % 7) / 10) for i in range(100)],
            ["doc_id", "score"],
        )
        plan = (
            curriculum_order(df, "score")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            nxt = lines[i + 1] if i + 1 < len(lines) else ""
            assert re.search(
                r"Aggregate\(key(s)?=\[\]", nxt
            ) or re.search(
                r"Aggregate\(key(s)?=\[[^\]]*(_pb|_bkt)#", nxt
            ), f"fact-table one-task funnel:\n{ln}\n{nxt}"

    def test_validates_n_phases(self, spark):
        import pytest as _pytest

        from txtlogparser_spark.operators.sampling import curriculum_order

        df = spark.createDataFrame([(1, 0.5)], ["doc_id", "score"])
        with _pytest.raises(ValueError):
            curriculum_order(df, "score", n_phases=1)
        with _pytest.raises(ValueError):
            curriculum_order(df, "score", n_phases=10)

    def test_null_scores_excluded_up_front_documented(self, spark):
        """NULL-score rows are excluded by the documented explicit
        filter, real rows keep the no-NULL ordering (positions stay a
        contiguous 0..n-1 permutation of scored rows) — not silently
        dropped deeper in the plan with skewed buckets."""
        from txtlogparser_spark.operators.sampling import curriculum_order

        rows = [(i, float(i % 5) / 10) for i in range(20)] + [(99, None)]
        df = spark.createDataFrame(rows, "doc_id long, score double")
        out = curriculum_order(df, "score", n_phases=3).collect()
        assert sorted(r["doc_id"] for r in out) == list(range(20))
        assert sorted(r["curriculum_pos"] for r in out) == list(range(20))
        clean = curriculum_order(
            df.where("score is not null"), "score", n_phases=3
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, clean))
