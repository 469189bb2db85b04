"""dsir_select / dsir_weights (operators/dsir.py): independent-model
parity, exactness/partitioning-invariance of the fixed-point weights,
directional sanity (target-like docs weigh more), plan shape (map-only
scoring, TakeOrderedAndProject head), and edge cases."""

import math

import pytest

SEED = "dsir-v1"
B = 16


def md5_hex(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def model_grams(text: str) -> list:
    ws = [w for w in text.lower().split() if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def model_bucket(g: str) -> int:
    return int(md5_hex(f"{SEED}:{g}")[:7], 16) % B


def model_weights(raw_rows, target_rows, smoothing=0.5):
    from collections import Counter

    tc, rc = Counter(), Counter()
    for _i, t in target_rows:
        tc.update(model_bucket(g) for g in model_grams(t))
    for _i, t in raw_rows:
        rc.update(model_bucket(g) for g in model_grams(t))
    ctt, crt = sum(tc.values()), sum(rc.values())
    lam = smoothing
    qr = []
    for b in range(B):
        r = math.log((tc.get(b, 0) + lam) / (ctt + lam * B)) - math.log(
            (rc.get(b, 0) + lam) / (crt + lam * B)
        )
        qr.append(int(math.floor(r * 16777216.0 + 0.5)))
    out = {}
    for i, t in raw_rows:
        wfp = sum(qr[model_bucket(g)] for g in model_grams(t))
        out[i] = (wfp, round(wfp / 16777216.0, 6))
    return out


RAW = [
    (0, "spark join merge join table"),
    (1, "stream window stream window stream"),
    (2, "the quick brown fox jumps"),
    (3, "spark join table scan"),
    (4, ""),
    (5, "merge join spark spark"),
]
TARGET = [
    (100, "spark join merge"),
    (101, "spark table join scan merge"),
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    return raw, target


class TestDsirWeights:
    def test_matches_model(self, spark, frames):
        from txtlogparser_spark.operators.dsir import dsir_weights

        raw, target = frames
        got = {
            r["doc_id"]: (r["weight_fp"], r["weight"])
            for r in dsir_weights(raw, target, n_buckets=B).collect()
        }
        assert got == model_weights(RAW, TARGET)

    def test_target_like_docs_weigh_more(self, spark, frames):
        from txtlogparser_spark.operators.dsir import dsir_weights

        raw, target = frames
        w = {
            r["doc_id"]: r["weight"]
            for r in dsir_weights(raw, target, n_buckets=B).collect()
        }
        # doc 3 is the most target-like (every gram class in-target),
        # doc 2 entirely off-target — the extremes must order correctly
        # even under B=16 hash collisions
        assert w[3] == max(w.values()) and w[3] > 0
        assert w[2] == min(w.values()) and w[2] < 0

    def test_empty_doc_zero_weight(self, spark, frames):
        from txtlogparser_spark.operators.dsir import dsir_weights

        raw, target = frames
        w = {r["doc_id"]: r["weight_fp"] for r in
             dsir_weights(raw, target, n_buckets=B).collect()}
        assert w[4] == 0

    def test_weights_partitioning_invariant(self, spark, frames):
        """Fixed-point integer sums: identical under any repartitioning
        (a float Σ over grams would be order-sensitive)."""
        from txtlogparser_spark.operators.dsir import dsir_weights

        raw, target = frames
        a = sorted(
            (r["doc_id"], r["weight_fp"])
            for r in dsir_weights(raw, target, n_buckets=B).collect()
        )
        b = sorted(
            (r["doc_id"], r["weight_fp"])
            for r in dsir_weights(
                raw.repartition(7), target.repartition(3), n_buckets=B
            ).collect()
        )
        assert a == b

    def test_scoring_is_map_only(self, spark, frames):
        """The scoring projection (after the two dim collects) must not
        shuffle: no Exchange in the weights plan."""
        from txtlogparser_spark.operators.dsir import dsir_weights

        raw, target = frames
        plan = (
            dsir_weights(raw, target, n_buckets=B)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan  # pure Catalyst, no UDF


class TestDsirSelect:
    def test_selects_topn_by_gumbel_key(self, spark, frames):
        from txtlogparser_spark.operators.dsir import dsir_select

        raw, target = frames
        got = dsir_select(raw, target, 3, n_buckets=B).collect()
        assert len(got) == 3
        # replay the key model-side
        wts = model_weights(RAW, TARGET)
        keys = []
        for i, _t in RAW:
            h = int(md5_hex(f"gum:{SEED}:{i}")[:12], 16)
            u = (h + 1) / 281474976710657.0
            keys.append((i, wts[i][0] / 16777216.0 / 1.0
                         + -math.log(-math.log(u))))
        keys.sort(key=lambda p: (-p[1], p[0]))
        assert [r["doc_id"] for r in got] == [i for i, _ in keys[:3]]

    def test_head_is_take_ordered(self, spark, frames):
        from txtlogparser_spark.operators.dsir import dsir_select

        raw, target = frames
        plan = (
            dsir_select(raw, target, 3, n_buckets=B)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "Exchange SinglePartition" not in plan

    def test_temperature_flattens(self, spark, frames):
        """τ→∞ makes selection pure Gumbel (weight ignored): the top-n
        under huge τ must equal the top-n by bare Gumbel key."""
        from txtlogparser_spark.operators.dsir import dsir_select

        raw, target = frames
        got = [
            r["doc_id"]
            for r in dsir_select(
                raw, target, 3, n_buckets=B, temperature=1e12
            ).collect()
        ]
        keys = []
        for i, _t in RAW:
            h = int(md5_hex(f"gum:{SEED}:{i}")[:12], 16)
            u = (h + 1) / 281474976710657.0
            keys.append((i, -math.log(-math.log(u))))
        keys.sort(key=lambda p: (-p[1], p[0]))
        assert got == [i for i, _ in keys[:3]]

    def test_validations(self, spark, frames):
        from txtlogparser_spark.operators.dsir import (
            dsir_select,
            dsir_weights,
            logratio_fp,
        )

        raw, target = frames
        with pytest.raises(ValueError):
            dsir_select(raw, target, 0)
        with pytest.raises(ValueError):
            dsir_select(raw, target, 1, temperature=0.0)
        with pytest.raises(ValueError):
            dsir_weights(raw, target, n_buckets=0)
        with pytest.raises(ValueError):
            logratio_fp({}, {}, 4, smoothing=0.0)

    def test_empty_target_still_works(self, spark, frames):
        """An empty target degrades to a uniform-smoothed model (all
        ct=0) — selection still returns n deterministic rows."""
        from txtlogparser_spark.operators.dsir import dsir_select

        raw, _ = frames
        empty = spark.createDataFrame([], "doc_id long, text string")
        got = dsir_select(raw, empty, 2, n_buckets=B).collect()
        assert len(got) == 2


def test_null_text_scores_zero_not_null(spark):
    """A NULL text must weight 0 (like an empty doc), not NULL — a NULL
    key would sort last and make the doc unselectable while the DuckDB
    replay (COALESCE 0) could select it."""
    from txtlogparser_spark.operators.dsir import dsir_weights

    raw = spark.createDataFrame(
        [(0, None), (1, "spark join")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "spark")], ["doc_id", "text"])
    w = {r["doc_id"]: r["weight_fp"] for r in
         dsir_weights(raw, target, n_buckets=8).collect()}
    assert w[0] == 0
