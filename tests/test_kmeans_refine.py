"""Lloyd k-means quantizer refinement (operators/similarity.py::
kmeans_refine + ivf_cell_stats).

The distributed-determinism claim under test: per-cell means are
computed over FIXED-POINT quantized components (floor(x*2^24+0.5)
summed as exact decimals), so the result is bit-identical regardless of
partitioning — the float-sum order nondeterminism that normally makes
distributed k-means irreproducible is gone by construction. The same
integer sums are what let the DuckDB oracle (`ivf_kmeans_refine`)
replay both iterations exactly.
"""

import math

import pytest

import pyspark.sql.functions as F


def _hash_vec(i: int, dim: int, spread: float = 1.0, base=None):
    """Deterministic pseudo-random vector from an md5 stream."""
    import hashlib

    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)
        out.append((h / 0xFFFFFFFF - 0.5) * spread + (base[j] if base else 0.0))
    return out


def _python_kmeans(rows, cents, iters, scale=float(1 << 24)):
    """Reference model: the exact arithmetic kmeans_refine performs
    (sequential-fold cosines, integer fixed-point sums, n*scale
    division grouping)."""

    def dotseq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    def assign(v):
        nv = norm(v)
        best, bs = None, None
        for c, cv in enumerate(cents):
            s = dotseq(v, cv) / (nv * norm(cv))
            if bs is None or s > bs:
                bs, best = s, c
        return best

    dim = len(cents[0])
    for _ in range(iters):
        sums, counts = {}, {}
        for v in rows:
            c = assign(v)
            counts[c] = counts.get(c, 0) + 1
            s = sums.setdefault(c, [0] * dim)
            for i, x in enumerate(v):
                s[i] += int(math.floor(x * scale + 0.5))
        cents = [
            [float(sums[c][i]) / (float(counts[c]) * scale) for i in range(dim)]
            if c in counts
            else list(old)
            for c, old in enumerate(cents)
        ]
    return cents


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>",
    )


class TestKmeansRefine:
    def test_partition_invariance(self, spark):
        """Identical centroids (exact float equality) under different
        partitionings — the property plain float sums do NOT have."""
        from txtlogparser_spark.operators.similarity import (
            ivf_centroids,
            kmeans_refine,
        )

        vecs = [_hash_vec(i, 12) for i in range(80)]
        df = _df(spark, vecs)
        seeds = ivf_centroids(df, 4)
        a = kmeans_refine(df.repartition(1), list(seeds), iters=2)
        b = kmeans_refine(df.repartition(7, "vec_id"), list(seeds), iters=2)
        assert a == b

    def test_matches_python_model(self, spark):
        from txtlogparser_spark.operators.similarity import (
            ivf_centroids,
            kmeans_refine,
        )

        vecs = [_hash_vec(i, 8) for i in range(60)]
        df = _df(spark, vecs)
        seeds = ivf_centroids(df, 4)
        got = kmeans_refine(df, list(seeds), iters=2)
        want = _python_kmeans(vecs, [list(c) for c in seeds], iters=2)
        assert got == want

    def test_empty_cell_keeps_centroid(self, spark):
        """A centroid that attracts no members survives unchanged (no
        RNG re-seeding; deterministic across engines)."""
        from txtlogparser_spark.operators.similarity import kmeans_refine

        # all corpus mass along +x; the -x centroid gets no members
        df = _df(spark, [[1.0, 0.01 * i] for i in range(10)])
        cents = [[1.0, 0.0], [-1.0, 0.0]]
        out = kmeans_refine(df, cents, iters=2)
        assert out[1] == [-1.0, 0.0]
        assert out[0] != [1.0, 0.0]  # the live cell did move

    def test_iters_zero_is_identity_and_validation(self, spark):
        from txtlogparser_spark.operators.similarity import kmeans_refine

        df = _df(spark, [[1.0, 0.0]])
        cents = [[0.5, 0.5]]
        assert kmeans_refine(df, cents, iters=0) == cents
        with pytest.raises(ValueError):
            kmeans_refine(df, cents, iters=-1)
        with pytest.raises(ValueError):
            kmeans_refine(df, [], iters=1)

    def test_improves_lloyd_objective_on_skewed_corpus(self, spark):
        """Skewed corpus: 85% of vectors in one tight direction.
        Refinement must IMPROVE the quantizer's objective — mean cosine
        of each vector to its assigned centroid direction — over the
        md5 seeds (that is what Lloyd optimizes; it does NOT promise
        cell balance, which is why semantic_dedup_pairs' hot-cell
        guard is blocked_cosine_pairs' grid decomposition, not this).
        Cell totals stay conserved and the centroids genuinely move."""
        from txtlogparser_spark.operators.similarity import (
            ivf_cell_stats,
            ivf_centroids,
            kmeans_refine,
        )

        hot = [1.0] * 8
        vecs = [_hash_vec(i, 8, spread=0.05, base=hot) for i in range(170)]
        vecs += [_hash_vec(1000 + i, 8, spread=2.0) for i in range(30)]
        df = _df(spark, vecs)
        seeds = ivf_centroids(df, 4)
        refined = kmeans_refine(df, list(seeds), iters=3)
        assert refined != seeds

        def objective(cents):
            def norm(a):
                return math.sqrt(sum(x * x for x in a))

            tot = 0.0
            for v in vecs:
                tot += max(
                    sum(x * y for x, y in zip(v, c)) / (norm(v) * norm(c))
                    for c in cents
                )
            return tot / len(vecs)

        assert objective(refined) > objective(seeds)
        rows = ivf_cell_stats(df, refined).collect()
        assert sum(r["n_rows"] for r in rows) == len(vecs)

    def test_cell_stats_schema_and_total(self, spark):
        from txtlogparser_spark.operators.similarity import (
            ivf_cell_stats,
            ivf_centroids,
        )

        df = _df(spark, [_hash_vec(i, 6) for i in range(40)])
        cents = ivf_centroids(df, 4)
        out = ivf_cell_stats(df, cents)
        assert [f.name for f in out.schema.fields] == ["cell", "n_rows", "cnorm_r"]
        rows = out.collect()
        assert sum(r["n_rows"] for r in rows) == 40
        for r in rows:
            want = round(math.sqrt(sum(x * x for x in cents[r["cell"]])), 6)
            assert r["cnorm_r"] == pytest.approx(want, abs=1e-9)

    def test_refine_iters_wiring(self, spark):
        """refine_iters threads through ivf_topk and
        semantic_dedup_pairs without changing contracts (schema, ranks,
        pair ordering)."""
        from txtlogparser_spark.operators.similarity import (
            ivf_topk,
            semantic_dedup_pairs,
        )

        corpus = _df(spark, [_hash_vec(i, 8) for i in range(50)])
        queries = spark.createDataFrame(
            [(i, _hash_vec(900 + i, 8)) for i in range(3)],
            "query_id long, qv array<double>",
        )
        top = ivf_topk(
            queries, corpus, k=3, n_cells=4, nprobe=2, refine_iters=2
        ).collect()
        assert {r["query_id"] for r in top} == {0, 1, 2}
        for r in top:
            assert 1 <= r["rank"] <= 3

        pairs = semantic_dedup_pairs(
            corpus, n_cells=4, threshold=0.2, refine_iters=1
        )
        assert [f.name for f in pairs.schema.fields] == ["vec_a", "vec_b", "sim_r"]
        got = pairs.collect()
        for r in got:
            assert r["vec_a"] < r["vec_b"]
            assert r["sim_r"] >= 0.2
