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
