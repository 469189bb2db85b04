"""token_frequency / token_coverage (operators/token_stats.py):
independent-model parity, tie-breaking determinism, and the
window-over-dim plan shape (the quota_sample lesson: the rank window
must consume the aggregated frequency dim, never raw corpus rows)."""

from collections import Counter, defaultdict

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("s0", [1, 1, 1, 2, 2, 3]),
        ("s0", [1, 2, 4]),
        ("s1", [7, 7, 8, 8]),      # 7 and 8 tie at 2 — rank by token asc
        ("s1", [9]),
        ("s2", []),                 # empty docs contribute nothing
        ("s2", [5, 5, 5, 5]),
    ]
    return spark.createDataFrame(rows, ["source", "tokens"])


def model_coverage(rows, k):
    per = defaultdict(Counter)
    for src, toks in rows:
        per[src].update(toks)
    out = {}
    for src, cnt in per.items():
        if not cnt:
            continue
        ranked = sorted(cnt.items(), key=lambda it: (-it[1], it[0]))
        total = sum(cnt.values())
        topk = sum(n for _, n in ranked[:k])
        out[src] = (
            total,
            len(cnt),
            topk,
            ranked[0][0],
            round(topk / total, 6),
        )
    return out


class TestTokenStats:
    ROWS = [
        ("s0", [1, 1, 1, 2, 2, 3]),
        ("s0", [1, 2, 4]),
        ("s1", [7, 7, 8, 8]),
        ("s1", [9]),
        ("s2", []),
        ("s2", [5, 5, 5, 5]),
    ]

    def test_frequency_counts(self, spark, docs):
        from txtlogparser_spark.operators.token_stats import token_frequency

        got = {
            (r["source"], r["token"]): r["n"]
            for r in token_frequency(docs, group_col="source").collect()
        }
        want = {}
        for src, toks in self.ROWS:
            for t in toks:
                want[(src, t)] = want.get((src, t), 0) + 1
        assert got == want

        # corpus-wide (no group)
        g2 = {
            r["token"]: r["n"]
            for r in token_frequency(docs, group_col=None).collect()
        }
        w2 = Counter(t for _, toks in self.ROWS for t in toks)
        assert g2 == dict(w2)

    @pytest.mark.parametrize("k", [1, 2, 100])
    def test_coverage_matches_model(self, spark, docs, k):
        from txtlogparser_spark.operators.token_stats import token_coverage

        got = {
            r["source"]: (
                r["n_tokens"],
                r["n_distinct"],
                r["topk_mass"],
                r["top_token"],
                r["coverage"],
            )
            for r in token_coverage(docs, group_col="source", k=k).collect()
        }
        assert got == model_coverage(self.ROWS, k)

    def test_tie_break_is_token_ascending(self, spark, docs):
        """s1 has 7 and 8 tied at 2 occurrences: k=1 must pick 7."""
        from txtlogparser_spark.operators.token_stats import token_coverage

        row = (
            token_coverage(docs, group_col="source", k=1)
            .where("source = 's1'")
            .first()
        )
        assert row["top_token"] == 7
        assert row["topk_mass"] == 2 and row["n_tokens"] == 5

    def test_window_runs_over_dim_not_corpus(self, spark, docs):
        """The rank window's input must be the aggregated (group, token)
        dim: a HashAggregate sits below the Window in the physical plan,
        so no task ever sorts raw corpus rows of a hot group."""
        from txtlogparser_spark.operators.token_stats import token_coverage

        plan = (
            token_coverage(docs, group_col="source", k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        win_at = plan.find("Window")
        assert win_at != -1
        assert "HashAggregate" in plan[win_at:], (
            "no aggregation below the window — it would rank raw rows"
        )

    def test_validates_k(self, spark, docs):
        from txtlogparser_spark.operators.token_stats import token_coverage

        with pytest.raises(ValueError):
            token_coverage(docs, k=0)


class TestTokenDrift:
    """token_drift_table / _summary / _top: model parity vs an
    independent Python reference, degenerate slices, and the
    vocab-bounded plan shape."""

    A = [[1, 2, 3], [1, 1, 4], [2, 5]]
    B = [[1, 2, 2], [6, 6, 6, 2]]

    @staticmethod
    def model(a_rows, b_rows, lam=0.5):
        import math
        from collections import Counter

        ca = Counter(t for r in a_rows for t in r)
        cb = Counter(t for r in b_rows for t in r)
        vocab = sorted(set(ca) | set(cb))
        na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
        p = {t: (ca.get(t, 0) + lam) / (na + lam * v) for t in vocab}
        q = {t: (cb.get(t, 0) + lam) / (nb + lam * v) for t in vocab}
        kl_ab = sum(p[t] * math.log(p[t] / q[t]) for t in vocab)
        kl_ba = sum(q[t] * math.log(q[t] / p[t]) for t in vocab)
        js = sum(
            0.5
            * (
                p[t] * math.log(p[t] / ((p[t] + q[t]) / 2))
                + q[t] * math.log(q[t] / ((p[t] + q[t]) / 2))
            )
            for t in vocab
        )
        l1 = sum(abs(p[t] - q[t]) for t in vocab)
        return {
            "n_tok_a": na, "n_tok_b": nb,
            "vocab_a": len(ca), "vocab_b": len(cb), "vocab_union": v,
            "kl_ab": round(kl_ab, 6), "kl_ba": round(kl_ba, 6),
            "js_div": round(js, 6), "l1_dist": round(l1, 6),
            "p": p, "q": q,
        }

    def _dfs(self, spark, a_rows, b_rows):
        mk = lambda rows: spark.createDataFrame(
            [(i, r) for i, r in enumerate(rows)],
            "doc_id LONG, tokens ARRAY<INT>",
        )
        return mk(a_rows), mk(b_rows)

    def test_table_counts(self, spark):
        from txtlogparser_spark.operators.token_stats import (
            token_drift_table,
        )

        a, b = self._dfs(spark, self.A, self.B)
        got = {
            r["token"]: (r["n_a"], r["n_b"])
            for r in token_drift_table(a, b).collect()
        }
        assert got == {
            1: (3, 1), 2: (2, 3), 3: (1, 0), 4: (1, 0),
            5: (1, 0), 6: (0, 3),
        }

    def test_summary_matches_model(self, spark):
        from txtlogparser_spark.operators.token_stats import (
            token_drift_summary,
        )

        a, b = self._dfs(spark, self.A, self.B)
        row = token_drift_summary(a, b).collect()[0].asDict()
        want = self.model(self.A, self.B)
        for k in (
            "n_tok_a", "n_tok_b", "vocab_a", "vocab_b", "vocab_union",
            "kl_ab", "kl_ba", "js_div", "l1_dist",
        ):
            assert row[k] == want[k], k

    def test_identical_slices_zero_drift(self, spark):
        from txtlogparser_spark.operators.token_stats import (
            token_drift_summary,
        )

        a, b = self._dfs(spark, self.A, self.A)
        row = token_drift_summary(a, b).collect()[0]
        assert (row["kl_ab"], row["kl_ba"], row["js_div"],
                row["l1_dist"]) == (0.0, 0.0, 0.0, 0.0)

    def test_empty_side(self, spark):
        from txtlogparser_spark.operators.token_stats import (
            token_drift_summary,
        )

        a, b = self._dfs(spark, self.A, [])
        row = token_drift_summary(a, b).collect()[0]
        # q is uniform over the union vocab: KL finite, metrics positive
        assert row["n_tok_b"] == 0 and row["vocab_b"] == 0
        assert row["kl_ab"] > 0 and row["js_div"] > 0

    def test_top_matches_model(self, spark):
        from txtlogparser_spark.operators.token_stats import (
            token_drift_top,
        )

        a, b = self._dfs(spark, self.A, self.B)
        want = self.model(self.A, self.B)
        diffs = sorted(
            ((abs(want["p"][t] - want["q"][t]), t) for t in want["p"]),
            key=lambda x: (-x[0], x[1]),
        )
        got = token_drift_top(a, b, k=3).collect()
        assert [r["token"] for r in got] == [t for _, t in diffs[:3]]
        for r, (d, _t) in zip(got, diffs):
            assert r["abs_diff"] == round(d, 9)

    def test_validates_args(self, spark):
        from txtlogparser_spark.operators.token_stats import (
            token_drift_summary,
            token_drift_top,
        )

        a, b = self._dfs(spark, self.A, self.B)
        with pytest.raises(ValueError):
            token_drift_summary(a, b, smoothing=0.0)
        with pytest.raises(ValueError):
            token_drift_top(a, b, k=0)

    def test_metric_joins_dims_not_corpora(self, spark):
        """The only join anywhere is the full-outer on the two
        (token, n) dims — below each join input sits a HashAggregate
        (the map-side-combined frequency groupBy), so the corpora are
        never co-shuffled."""
        from txtlogparser_spark.operators.token_stats import (
            token_drift_table,
        )

        a, b = self._dfs(spark, self.A, self.B)
        plan = (
            token_drift_table(a, b)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert (
            plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
            == 1
        )
        assert plan.count("HashAggregate") >= 2

    def test_metric_job_reads_cached_dim_no_second_join(self, spark):
        """token_drift_summary persists the drift table and inlines the
        driver-collected totals as literals: the metric job must read
        the cached dim (InMemoryTableScan) and contain NO join — the
        corpus frequency passes run exactly once, during cache fill."""
        from txtlogparser_spark.operators.token_stats import _drift_base

        a, b = self._dfs(spark, self.A, self.B)
        tbl, withtot = _drift_base(a, b, "tokens", 0.5)
        try:
            plan = (
                withtot._jdf.queryExecution().executedPlan().toString()
            )
            assert "InMemoryTableScan" in plan
            # the join may appear in the PRINTED cached-relation subplan
            # (it ran once, at cache fill); above the cache scan the
            # metric job itself must be join-free
            assert "Join" not in plan.split("InMemoryTableScan")[0]
        finally:
            tbl.unpersist()

    def test_null_token_ids_excluded(self, spark):
        from txtlogparser_spark.operators.token_stats import (
            token_drift_summary,
            token_drift_table,
        )

        mk = lambda rows: spark.createDataFrame(
            [(i, r) for i, r in enumerate(rows)],
            "doc_id LONG, tokens ARRAY<INT>",
        )
        a, b = mk([[1, None]]), mk([[None, 2]])
        got = {
            r["token"]: (r["n_a"], r["n_b"])
            for r in token_drift_table(a, b).collect()
        }
        assert got == {1: (1, 0), 2: (0, 1)}
        row = token_drift_summary(a, b).collect()[0]
        assert row["vocab_union"] == 2
        assert row["n_tok_a"] == 1 and row["n_tok_b"] == 1

    def test_both_empty_zeros_not_nulls(self, spark):
        from txtlogparser_spark.operators.token_stats import (
            token_drift_summary,
        )

        a, b = self._dfs(spark, [], [])
        row = token_drift_summary(a, b).collect()[0].asDict()
        assert row == {
            "n_tok_a": 0, "n_tok_b": 0, "vocab_a": 0, "vocab_b": 0,
            "vocab_union": 0, "kl_ab": 0.0, "kl_ba": 0.0,
            "js_div": 0.0, "l1_dist": 0.0,
        }

    def test_report_matches_individual_calls(self, spark):
        from txtlogparser_spark.operators.token_stats import (
            token_drift_report,
            token_drift_summary,
            token_drift_top,
        )

        a, b = self._dfs(spark, self.A, self.B)
        s, t = token_drift_report(a, b, k=3)
        assert s.collect() == token_drift_summary(a, b).collect()
        assert t.collect() == token_drift_top(a, b, k=3).collect()


class TestTokenEntropy:
    """token_entropy: map-only fold parity vs a Counter-based model,
    analytic fixtures, NULL/empty semantics, and the no-shuffle plan."""

    @staticmethod
    def model(toks):
        import math
        from collections import Counter

        if not toks:
            return None
        n = len(toks)
        s = sum(c * math.log(c) for c in Counter(toks).values())
        return round(math.log(n) - s / n, 6)

    CASES = [
        [],                        # empty -> NULL
        [5],                       # single token -> 0
        [7, 7, 7, 7],              # constant -> 0
        [1, 2, 3, 4],              # uniform -> ln(4)
        [1, 1, 2, 3],              # mixed
        [3, 1, 2, 1, 3, 1],        # unsorted input, repeated runs
        list(range(50)) * 2,       # larger uniform-ish
    ]

    def test_matches_model(self, spark):
        import math

        from txtlogparser_spark.operators.token_stats import token_entropy

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.CASES)],
            "doc_id LONG, tokens ARRAY<INT>",
        )
        got = {
            r["doc_id"]: r["h"]
            for r in df.select(
                "doc_id", token_entropy().alias("h")
            ).collect()
        }
        for i, toks in enumerate(self.CASES):
            assert got[i] == self.model(toks), (i, toks)
        assert got[1] == 0.0 and got[2] == 0.0
        assert got[3] == round(math.log(4), 6)

    def test_null_tokens_null_entropy(self, spark):
        from txtlogparser_spark.operators.token_stats import token_entropy

        df = spark.createDataFrame(
            [(0, None)], "doc_id LONG, tokens ARRAY<INT>"
        )
        assert df.select(token_entropy().alias("h")).first()["h"] is None

    def test_plan_is_map_only(self, spark):
        from txtlogparser_spark.operators.token_stats import token_entropy

        df = spark.createDataFrame(
            [(0, [1, 2])], "doc_id LONG, tokens ARRAY<INT>"
        )
        plan = (
            df.select("doc_id", token_entropy().alias("h"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for bad in ("Exchange", "Join", "Window", "Generate"):
            assert bad not in plan, plan


class TestZipfSlope:
    """zipf_slope: OLS parity vs a pure-Python model over the same
    deterministic ranking, degenerate groups, and the window-over-dim
    plan shape."""

    ROWS = [
        ("s0", [1] * 16 + [2] * 8 + [3] * 4 + [4] * 2 + [5]),  # zipf-ish
        ("s0", [1] * 16),
        ("s1", [7, 7, 8, 8]),      # all counts equal -> dyy=0 -> r2 NULL
        ("s2", [9, 9, 9]),          # single distinct -> slope/r2 NULL
    ]

    @staticmethod
    def model(rows):
        import math
        from collections import Counter, defaultdict

        per = defaultdict(Counter)
        for src, toks in rows:
            per[src].update(toks)
        out = {}
        for src, cnt in per.items():
            ranked = sorted(cnt.items(), key=lambda it: (-it[1], it[0]))
            pts = [
                (math.log(i + 1), math.log(n))
                for i, (_, n) in enumerate(ranked)
            ]
            k = len(pts)
            sx = sum(x for x, _ in pts)
            sy = sum(y for _, y in pts)
            sxx = sum(x * x for x, _ in pts)
            syy = sum(y * y for _, y in pts)
            sxy = sum(x * y for x, y in pts)
            num = k * sxy - sx * sy
            dxx = k * sxx - sx * sx
            dyy = k * syy - sy * sy
            slope = round(num / dxx, 6) if dxx != 0 else None
            r2 = (
                round(num * num / (dxx * dyy), 6)
                if dxx != 0 and dyy != 0
                else None
            )
            out[src] = (k, slope, r2)
        return out

    def test_matches_model(self, spark):
        from txtlogparser_spark.operators.token_stats import zipf_slope

        df = spark.createDataFrame(self.ROWS, ["source", "tokens"])
        got = {
            r["source"]: (r["n_distinct"], r["slope"], r["r2"])
            for r in zipf_slope(df).collect()
        }
        assert got == self.model(self.ROWS)
        # the zipf-ish source: halving counts per rank is slope < 0
        assert got["s0"][1] < 0
        assert got["s1"] == (2, 0.0, None)   # flat counts: slope 0
        assert got["s2"] == (1, None, None)  # one point: no fit

    def test_fit_runs_over_dim_not_corpus(self, spark):
        from txtlogparser_spark.operators.token_stats import zipf_slope

        df = spark.createDataFrame(self.ROWS, ["source", "tokens"])
        plan = (
            zipf_slope(df)._jdf.queryExecution().executedPlan().toString()
        )
        win_at = plan.find("Window")
        assert win_at != -1
        assert "HashAggregate" in plan[win_at:]


class TestPmiCollocations:
    ROWS = [
        # "1 2" appears often (strong collocation); 3/4 common alone
        ("d0", [1, 2, 3, 1, 2, 4, 1, 2]),
        ("d1", [1, 2, 3, 3, 4, 1, 2]),
        ("d2", [3, 4, 1, 2, 1, 2, 3]),
        ("d3", [4, 3, 4, 1, 2, 4]),
        ("d4", []),                       # no pairs
        ("d5", [9]),                      # single token, no pairs
    ]

    def _frame(self, spark):
        return spark.createDataFrame(self.ROWS, ["doc_id", "tokens"])

    @staticmethod
    def model(rows, min_count, k):
        import math
        from collections import Counter

        bi, uni = Counter(), Counter()
        for _id, toks in rows:
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        n_bi, n_uni = sum(bi.values()), sum(uni.values())
        out = []
        for (a, b), c in bi.items():
            if c < min_count:
                continue
            pmi = (
                math.log(c) + 2.0 * math.log(n_uni)
                - math.log(n_bi) - math.log(uni[a]) - math.log(uni[b])
            )
            out.append((a, b, c, pmi))
        out.sort(key=lambda t: (-t[3], t[0], t[1]))
        return [(a, b, c, round(p, 6)) for a, b, c, p in out[:k]]

    def test_matches_model(self, spark):
        from txtlogparser_spark.operators.token_stats import pmi_collocations

        got = [
            (r["a"], r["b"], r["c_ab"], r["pmi"])
            for r in pmi_collocations(
                self._frame(spark), min_count=2, k=10
            ).collect()
        ]
        assert got == self.model(self.ROWS, 2, 10)

    def test_min_count_drops_rare_pairs(self, spark):
        from txtlogparser_spark.operators.token_stats import pmi_collocations

        got = pmi_collocations(self._frame(spark), min_count=3, k=50).collect()
        assert all(r["c_ab"] >= 3 for r in got)
        assert {(r["a"], r["b"]) for r in got} == {
            (a, b) for a, b, c, _ in self.model(self.ROWS, 3, 50)
        }

    def test_pair_dim_aggregates_map_side(self, spark):
        """pair_frequency's physical plan must partially aggregate below
        the exchange (map-side combine): a 10^9-copy hot pair partially
        collapses per map partition, so the shuffle moves the dim, not
        the corpus."""
        from txtlogparser_spark.operators.token_stats import pair_frequency

        plan = (
            pair_frequency(self._frame(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        first_agg = plan.find("HashAggregate")
        exch = plan.find("Exchange")
        assert first_agg != -1 and exch != -1
        assert "HashAggregate" in plan[exch:], (
            "no partial aggregate below the exchange"
        )

    def test_topk_avoids_single_partition_sort(self, spark):
        """The top-k must be TakeOrderedAndProject (per-partition heads +
        k-row merge), never an Exchange SinglePartition + Sort."""
        from txtlogparser_spark.operators.token_stats import (
            pair_frequency,
            token_frequency,
        )
        import pyspark.sql.functions as F

        df = self._frame(spark)
        bi = pair_frequency(df)
        uni = token_frequency(df)
        scored = (
            bi.join(uni.select(F.col("token").alias("a"),
                               F.col("n").alias("c_a")), "a")
            .select("a", "b", "c", (F.log("c") - F.log("c_a")).alias("_pmi"))
        )
        plan = (
            scored.orderBy(F.desc("_pmi"), "a", "b").limit(5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "Exchange SinglePartition" not in plan

    def test_empty_and_validation(self, spark):
        from txtlogparser_spark.operators.token_stats import pmi_collocations

        empty = spark.createDataFrame([], "doc_id string, tokens array<int>")
        assert pmi_collocations(empty, min_count=1, k=5).collect() == []
        with pytest.raises(ValueError):
            pmi_collocations(empty, min_count=0)
        with pytest.raises(ValueError):
            pmi_collocations(empty, k=0)

    def test_null_ids_never_pair(self, spark):
        from txtlogparser_spark.operators.token_stats import pair_frequency

        df = spark.createDataFrame(
            [("d0", [1, None, 2, 1, None, 2])],
            "doc_id string, tokens array<int>",
        )
        got = {(r["a"], r["b"]): r["c"] for r in pair_frequency(df).collect()}
        assert got == {(2, 1): 1}


class TestVocabOverlap:
    ROWS = [
        ("s0", [1, 2, 3, 1]),
        ("s0", [4]),
        ("s1", [2, 3, 5]),
        ("s2", [9]),          # disjoint from s0/s1
        ("s3", []),           # empty vocab: appears in no pair
    ]

    def _frame(self, spark):
        return spark.createDataFrame(self.ROWS, ["source", "tokens"])

    def test_matches_model(self, spark):
        from txtlogparser_spark.operators.token_stats import vocab_overlap

        got = {
            (r["src_a"], r["src_b"]): (
                r["n_common"], r["n_a"], r["n_b"], r["jaccard"]
            )
            for r in vocab_overlap(self._frame(spark)).collect()
        }
        # s0={1,2,3,4} s1={2,3,5}: common {2,3} — jacc 2/5
        assert got == {("s0", "s1"): (2, 4, 3, 0.4)}

    def test_pair_join_runs_over_vocab_dim(self, spark):
        """The self-join must consume the DISTINCT (group, token) dim:
        an aggregate sits below the join on both sides, so a 10^9-copy
        token joins once, not 10^18 times."""
        from txtlogparser_spark.operators.token_stats import vocab_overlap

        plan = (
            vocab_overlap(self._frame(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        join_at = plan.find("Join")
        assert join_at != -1
        assert plan[join_at:].count("HashAggregate") >= 2, (
            "self-join inputs are not deduplicated vocab dims"
        )

    def test_null_tokens_ignored(self, spark):
        from txtlogparser_spark.operators.token_stats import vocab_overlap

        df = spark.createDataFrame(
            [("a", [1, None]), ("b", [None, 1])],
            "source string, tokens array<int>",
        )
        got = vocab_overlap(df).collect()
        assert len(got) == 1 and got[0]["n_common"] == 1
        assert got[0]["n_a"] == 1 and got[0]["n_b"] == 1


class TestNgramNovelty:
    ROWS = [
        (0, "a b c d e"),        # grams: abc bcd cde
        (1, "a b c x y"),        # shares 'a b c' with doc 0
        (2, "p q r s"),          # all novel
        (3, "a b"),              # too short for a 3-gram
    ]

    def test_matches_model(self, spark):
        from txtlogparser_spark.operators.token_stats import ngram_novelty

        df = spark.createDataFrame(self.ROWS, ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
            for r in ngram_novelty(df, n=3).collect()
        }
        from collections import Counter

        def grams(t):
            ws = t.split()
            return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

        freq = Counter()
        for _i, t in self.ROWS:
            freq.update(grams(t))
        want = {}
        for i, t in self.ROWS:
            g = grams(t)
            if not g:
                want[i] = (0, 0, None)
            else:
                nov = sum(1 for x in g if freq[x] == 1)
                want[i] = (len(g), nov, round(nov / len(g), 6))
        assert got == want

    def test_dfreq_aggregates_map_side(self, spark):
        """The gram doc-frequency dim must partially aggregate below its
        exchange — a 10^9-doc boilerplate gram collapses per map
        partition."""
        from txtlogparser_spark.operators.token_stats import ngram_novelty

        df = spark.createDataFrame(self.ROWS, ["doc_id", "text"])
        plan = (
            ngram_novelty(df, n=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        exch = plan.find("Exchange hashpartitioning(_g")
        assert exch != -1
        assert "HashAggregate" in plan[exch:], (
            "no partial aggregate below the gram-dim exchange"
        )
