"""Training-data pipeline operators: dedup (exact/minhash/simhash/jaccard),
similarity search, text analysis, multimodal plumbing."""

import numpy as np
import pytest
import pyspark.sql.functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank", "s0"),
        (1, "the quick brown fox jumps over the lazy dog near the river bend", "s0"),  # near-dup of 0
        (2, "completely different content about spark query optimization today", "s1"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank", "s1"),  # exact dup of 0
        (4, "el rapido zorro marron salta sobre el perro perezoso de la casa", "s1"),
        (5, "one two three", "s2"),
    ]
    return spark.createDataFrame(base, ["doc_id", "text", "source"])


class TestDedup:
    def test_exact(self, docs):
        from txtlogparser_spark.operators.dedup import exact_dedup

        out = {r["doc_id"]: (r["keeper_id"], r["is_dup"]) for r in exact_dedup(docs).collect()}
        assert out[0] == (0, False)
        assert out[3] == (0, True)
        assert out[1] == (1, False)  # near-dup is NOT an exact dup

    def test_exact_dedup_hot_digest_no_window(self, spark):
        """Keeper election must be a partial aggregation, not a window:
        a window over the digest serializes a 10^9-copy boilerplate
        digest through one task at scale. Plan pins Window absence;
        a dominant-digest input pins the values."""
        from txtlogparser_spark.operators.dedup import exact_dedup

        rows = [(i, "boilerplate page", "s0") for i in range(500)]
        rows += [(1000 + i, f"unique text {i}", "s1") for i in range(20)]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = exact_dedup(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        got = {r["doc_id"]: (r["keeper_id"], r["is_dup"]) for r in out.collect()}
        assert len(got) == 520
        assert got[0] == (0, False)
        assert all(got[i] == (0, True) for i in range(1, 500))
        assert all(got[1000 + i] == (1000 + i, False) for i in range(20))

    def test_ngram_jaccard(self, docs):
        from txtlogparser_spark.operators.dedup import ngram_jaccard_pairs

        pairs = {
            (r["doc_a"], r["doc_b"]): r["jacc"]
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
        assert (0, 1) in pairs and 0.5 < pairs[(0, 1)] < 1.0
        assert (1, 3) in pairs
        assert not any(2 in p or 4 in p or 5 in p for p in pairs)

    def test_minhash_lsh_finds_dups(self, docs):
        from txtlogparser_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
            ngram_jaccard_pairs,
            shingle_table,
        )

        sh = shingle_table(docs)
        sig = minhash_signatures(sh, num_hashes=16)
        cands = lsh_candidate_pairs(sig, num_hashes=16, band_size=4)
        got = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
        assert (0, 3) in got  # exact dup always collides
        assert (0, 1) in got or (1, 3) in got  # J≈0.8 almost surely banded
        # verify stage: exact jaccard restricted to candidates
        verified = ngram_jaccard_pairs(docs, threshold=0.5, candidates=cands)
        vp = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
        assert (0, 3) in vp

    def test_jaccard_candidate_mode_equals_restricted_exhaustive(self, docs):
        """The O(candidates) set-join verify (round-3 rewrite) must be
        value-identical to exhaustive-mode output restricted to the
        candidate pairs, and its plan must contain NO shingle-equality
        join (the round-2 all-pairs regression)."""
        from txtlogparser_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
            ngram_jaccard_pairs,
            shingle_table,
        )

        cands = lsh_candidate_pairs(
            minhash_signatures(shingle_table(docs), num_hashes=16),
            num_hashes=16,
            band_size=4,
        )
        cand_set = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
        got = ngram_jaccard_pairs(docs, threshold=0.5, candidates=cands)
        got_m = {(r["doc_a"], r["doc_b"]): r["jacc"] for r in got.collect()}
        exh = {
            (r["doc_a"], r["doc_b"]): r["jacc"]
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        assert got_m == {p: j for p, j in exh.items() if p in cand_set}
        plan = got._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Join" in line and "shingle" in line:
                raise AssertionError(
                    f"shingle-equality join found in candidate-mode plan: {line.strip()[:160]}"
                )

    def test_simhash_buckets(self, spark):
        # SimHash needs enough words for stable bit majorities: 60-word
        # texts differing in one word → tiny Hamming distance; unrelated
        # text → large. (12-word micro-docs are too noisy by design.)
        import random

        from txtlogparser_spark.operators.dedup import (
            simhash_candidate_pairs,
            with_simhash64,
        )

        random.seed(1)
        words = [f"w{i}" for i in range(500)]
        base = [random.choice(words) for _ in range(60)]
        near = list(base)
        near[7] = "CHANGED"
        other = [random.choice(words) for _ in range(60)]
        df = spark.createDataFrame(
            [
                (0, " ".join(base)),
                (1, " ".join(near)),
                (2, " ".join(other)),
                (3, " ".join(base)),
            ],
            ["doc_id", "text"],
        )
        sh = {r["doc_id"]: r["sh"] for r in with_simhash64(df).collect()}
        ham = lambda a, b: bin((sh[a] ^ sh[b]) & (2**64 - 1)).count("1")
        assert ham(0, 3) == 0  # identical text → identical simhash
        assert 0 < ham(0, 1) <= 3  # near-dup → tiny distance
        assert ham(0, 2) > 10  # unrelated → far
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_candidate_pairs(df, max_hamming=3).collect()
        }
        assert got.get((0, 3)) == 0
        assert (0, 1) in got  # pigeonhole bucketing catches hamming ≤ 3
        assert not any(2 in p for p in got)


class TestComponents:
    def test_duplicate_components_chain_clique_isolated(self, spark):
        # chain a-b-c (via transitive pairs), clique p-q-r, pair x-y:
        # rep = smallest reachable id, independent of pair orientation
        from txtlogparser_spark.operators.dedup import duplicate_components

        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("p", "q"), ("p", "r"), ("q", "r"),
             ("x", "y")],
            ["doc_a", "doc_b"],
        )
        got = {
            r["doc_id"]: r["group_rep"]
            for r in duplicate_components(pairs).collect()
        }
        assert got == {
            "a": "a", "b": "a", "c": "a",
            "p": "p", "q": "p", "r": "p",
            "x": "x", "y": "x",
        }

    def test_duplicate_components_long_path_converges(self, spark):
        # a 12-node path needs ~diameter rounds of label propagation —
        # exercises the iteration + convergence-stop logic (and the
        # localCheckpoint lineage truncation at checkpoint_every=3)
        from txtlogparser_spark.operators.dedup import duplicate_components

        n = 12
        ids = [f"n{i:02d}" for i in range(n)]
        pairs = spark.createDataFrame(
            [(ids[i], ids[i + 1]) for i in range(n - 1)], ["doc_a", "doc_b"]
        )
        got = {
            r["doc_id"]: r["group_rep"]
            for r in duplicate_components(pairs, checkpoint_every=3).collect()
        }
        assert got == {i: ids[0] for i in ids}

    def test_dedup_groups_on_fixture_docs(self, docs):
        # end-to-end chain over the module fixture: docs 0/1/3 form one
        # near-dup cluster (exact dup + jaccard>0.5 near-dup)
        from txtlogparser_spark.operators.dedup import (
            duplicate_components,
            lsh_candidate_pairs,
            minhash_signatures,
            ngram_jaccard_pairs,
            shingle_table,
        )

        sh = shingle_table(docs)
        cands = lsh_candidate_pairs(
            minhash_signatures(sh, num_hashes=16), num_hashes=16, band_size=4
        )
        pairs = ngram_jaccard_pairs(
            docs, threshold=0.5, candidates=cands
        ).select("doc_a", "doc_b")
        got = {
            r["doc_id"]: r["group_rep"]
            for r in duplicate_components(pairs).collect()
        }
        assert got == {0: 0, 1: 0, 3: 0}


class TestSimilarity:
    def test_brute_force_exact(self, spark):
        from txtlogparser_spark.operators.similarity import brute_force_topk, as_double_vec

        rng = np.random.RandomState(3)
        vecs = rng.randn(20, 8).astype("float32")
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(20)], ["vec_id", "v"]
        ).withColumn("v", as_double_vec("v"))
        queries = corpus.where("vec_id < 2").select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        got = brute_force_topk(queries, corpus.where("vec_id >= 2"), k=3)
        rows = got.collect()
        assert len(rows) == 6
        # numpy oracle
        def cos(a, b):
            return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        for q in (0, 1):
            sims = sorted(
                ((cos(vecs[q], vecs[i]), i) for i in range(2, 20)),
                key=lambda t: (-t[0], t[1]),
            )[:3]
            want = [i for _, i in sims]
            got_q = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"]) if r["query_id"] == q]
            assert got_q == want

    def test_broadcast_guard(self, spark):
        """Large corpora are never broadcast: the guard flips the build
        side to the (small) query batch; results are identical."""
        from txtlogparser_spark.operators.similarity import (
            _small,
            as_double_vec,
            brute_force_topk,
        )

        rng = np.random.RandomState(7)
        vecs = rng.randn(30, 8).astype("float32")
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(30)], ["vec_id", "v"]
        ).withColumn("v", as_double_vec("v"))
        queries = corpus.where("vec_id < 2").select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        cor = corpus.where("vec_id >= 2")
        # size heuristic on a file-backed relation: small under the default
        # cap, "large" under a 1-byte cap; in-memory relations (no stats)
        # conservatively count as large
        pq = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        assert _small(pq)
        assert not _small(pq, max_bytes=1)
        assert not _small(cor)  # ExistingRDD: unknown stats → never broadcast
        small_df = brute_force_topk(queries, cor, k=3, broadcast_corpus=True)
        large_df = brute_force_topk(queries, cor, k=3, broadcast_corpus=False)
        # forced-large: the broadcast subtree holds the QUERY side, not the corpus
        import contextlib, io

        def plan(df):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain()
            return buf.getvalue()

        small_plan, large_plan = plan(small_df), plan(large_df)
        assert "BroadcastExchange" in small_plan and "BroadcastExchange" in large_plan
        bcast_small = small_plan.split("BroadcastExchange", 1)[1]
        bcast_large = large_plan.split("BroadcastExchange", 1)[1]
        assert "query_id" not in bcast_small  # corpus is the broadcast side
        assert "query_id" in bcast_large  # query batch broadcast, corpus streamed
        # identical results either way
        key = lambda r: (r["query_id"], r["rank"])
        assert sorted(
            [(r["query_id"], r["rank"], r["neighbor_id"]) for r in small_df.collect()]
        ) == sorted(
            [(r["query_id"], r["rank"], r["neighbor_id"]) for r in large_df.collect()]
        )

    def test_lsh_recall_reasonable(self, spark):
        from txtlogparser_spark.operators.similarity import (
            as_double_vec,
            brute_force_topk,
            lsh_topk,
        )

        # clustered corpus: near neighbors are genuinely near (the use
        # case LSH serves); uniform gaussians have no meaningful top-k
        rng = np.random.RandomState(5)
        centers = rng.randn(10, 8) * 3
        vecs = np.vstack([
            centers[i % 10] + rng.randn(8) * 0.1 for i in range(60)
        ]).astype("float32")
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(60)], ["vec_id", "v"]
        ).withColumn("v", as_double_vec("v"))
        queries = corpus.where("vec_id < 3").select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        cor = corpus.where("vec_id >= 3")
        exact = brute_force_topk(queries, cor, k=3).collect()
        approx = lsh_topk(queries, cor, k=3, dim=8, bits=6, tables=3).collect()

        e = {(r["query_id"], r["neighbor_id"]) for r in exact}
        a = {(r["query_id"], r["neighbor_id"]) for r in approx}
        # clustered data: same-cluster vectors collide in ≥1 table
        assert len(e & a) >= (2 * len(e)) // 3

    def test_ivf_recall_and_plan(self, spark):
        """IVF-flat: on clustered data, probing the 2 nearest of 8 cells
        recovers most exact neighbors; the physical plan must be hash
        joins only (map-side cell assignment, no cartesian/nested-loop)."""
        from txtlogparser_spark.operators.similarity import (
            as_double_vec,
            brute_force_topk,
            ivf_topk,
        )

        rng = np.random.RandomState(11)
        centers = rng.randn(8, 8) * 4
        vecs = np.vstack([
            centers[i % 8] + rng.randn(8) * 0.15 for i in range(80)
        ]).astype("float32")
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(80)], ["vec_id", "v"]
        ).withColumn("v", as_double_vec("v"))
        queries = corpus.where("vec_id < 4").select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        cor = corpus.where("vec_id >= 4")
        approx_df = ivf_topk(queries, cor, k=3, n_cells=8, nprobe=2)
        plan = approx_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

        exact = brute_force_topk(queries, cor, k=3).collect()
        approx = approx_df.collect()
        e = {(r["query_id"], r["neighbor_id"]) for r in exact}
        a = {(r["query_id"], r["neighbor_id"]) for r in approx}
        # query's own cluster is its nearest cell → most true neighbors
        # live in a probed cell
        assert len(e & a) >= (2 * len(e)) // 3

    def test_ivf_matches_bruteforce_when_probing_all_cells(self, spark):
        """nprobe == n_cells ⇒ every cell scanned ⇒ IVF must equal the
        exact baseline row-for-row (the bucketing only PARTITIONS the
        corpus, it never drops or duplicates a row)."""
        from txtlogparser_spark.operators.similarity import (
            as_double_vec,
            brute_force_topk,
            ivf_topk,
        )

        rng = np.random.RandomState(3)
        vecs = rng.randn(40, 6).astype("float32")
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(40)], ["vec_id", "v"]
        ).withColumn("v", as_double_vec("v"))
        queries = corpus.where("vec_id < 3").select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        cor = corpus.where("vec_id >= 3")
        exact = brute_force_topk(queries, cor, k=4).collect()
        full = ivf_topk(queries, cor, k=4, n_cells=4, nprobe=4).collect()
        key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
        assert sorted(map(key, exact)) == sorted(map(key, full))

    def test_lsh_plan_hash_joins_only(self, spark):
        """Candidate enumeration must be per-table equi-joins (hash-
        joinable), never a nested-loop over an OR of signature
        equalities — the OR form is O(queries × corpus) at scale."""
        from txtlogparser_spark.operators.similarity import as_double_vec, lsh_topk

        corpus = spark.createDataFrame(
            [(i, [float(i), 1.0, 0.5, -1.0]) for i in range(20)], ["vec_id", "v"]
        ).withColumn("v", as_double_vec("v"))
        queries = corpus.where("vec_id < 2").select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        plan = lsh_topk(
            queries, corpus.where("vec_id >= 2"), k=3, dim=4, bits=6, tables=2
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestTextFunctions:
    def test_counts_and_quality(self, docs):
        from txtlogparser_spark.functions.text import (
            quality_score,
            regex_token_count,
            stopword_ratio,
            whitespace_token_count,
        )

        row = (
            docs.where("doc_id = 0")
            .select(
                whitespace_token_count().alias("n"),
                regex_token_count().alias("nr"),
                stopword_ratio().alias("sr"),
                quality_score().alias("q"),
            )
            .collect()[0]
        )
        assert row["n"] == 13
        assert row["nr"] == 13
        assert abs(row["sr"] - 3 / 13) < 1e-6
        assert 0.0 <= row["q"] <= 1.0

    def test_langid(self, docs):
        from txtlogparser_spark.functions.text import langid_heuristic

        got = {
            r["doc_id"]: r["lang"]
            for r in docs.select("doc_id", langid_heuristic().alias("lang")).collect()
        }
        assert got[0] == "en"
        assert got[4] == "es"
        assert got[5] == "und"

    def test_tfidf_top_terms(self, spark):
        import math

        from txtlogparser_spark.functions.text import tfidf_top_terms

        d = spark.createDataFrame(
            [
                (0, "alpha alpha beta", "g1"),
                (1, "alpha gamma", "g1"),
                (2, "beta beta delta", "g2"),
                (3, "alpha beta", "g2"),
            ],
            ["doc_id", "text", "grp"],
        )
        out = tfidf_top_terms(d, "text", "grp", k=2).collect()
        got = {(r["grp"], r["rank"]): (r["word"], r["tf"], r["score"]) for r in out}
        # hand-computed: N=4; df(alpha)=3, df(beta)=3, df(gamma)=1, df(delta)=1
        idf_rare = math.log(5 / 2)  # gamma/delta
        assert got[("g1", 1)][0] == "gamma"
        assert got[("g1", 1)][2] == round(1 * idf_rare, 6)
        assert got[("g2", 1)][0] == "delta"
        # g1 rank2: alpha tf=3 score=3*ln(5/4)=0.669431 beats nothing else
        assert got[("g1", 2)][0] == "alpha"
        assert got[("g1", 2)][1] == 3


class TestMultimodal:
    def test_feature_extraction_plumbing(self, spark):
        from txtlogparser_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            deterministic_fake_decoder,
            extract_features,
            frame_sample_plan,
        )

        rows = [
            ("m1", "image", b"\x89PNG-fake-bytes", ("image/png", 4, 4, None)),
            ("m2", "audio", b"RIFF-fake", ("audio/wav", None, None, 2000)),
            ("m3", "video", b"mp4-fake", ("video/mp4", 16, 16, 3000)),
            ("m4", "image", None, ("image/png", 1, 1, None)),
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        feats = extract_features(media, dim=8).collect()
        by_id = {r["doc_id"]: r for r in feats}
        assert len(by_id["m1"]["feature"]) == 8
        assert by_id["m4"]["n_bytes"] == 0
        # determinism: same payload → same features across runs
        feats2 = extract_features(media, dim=8).collect()
        assert {r["doc_id"]: r["feature"] for r in feats2} == {
            r["doc_id"]: r["feature"] for r in feats
        }
        # real decoder is an explicit stub
        from txtlogparser_spark.operators.multimodal import real_decoder

        with pytest.raises(NotImplementedError):
            real_decoder(b"x", None)
        # frame sampling expands by duration
        frames = frame_sample_plan(media, every_ms=1000).collect()
        assert {r["frame_ms"] for r in frames} == {0, 1000, 2000, 3000}
