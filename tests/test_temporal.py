"""Temporal join operators (operators/temporal.py): as-of join against
pandas.merge_asof (the reference semantics for backward/forward/strict),
bucketed range join against the naive inequality join, and plan-shape
pins (no nested-loop / cartesian anywhere — the whole point of both
implementations)."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from txtlogparser_spark.operators.temporal import asof_join, bucketed_range_join


@pytest.fixture(scope="module")
def asof_frames(spark):
    rng = np.random.RandomState(7)
    lt = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 200),
            "t": rng.randint(0, 1000, 200).astype("int64"),
            "lid": np.arange(200),
        }
    )
    rt = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 150),
            "t": rng.randint(0, 1000, 150).astype("int64"),
            "rid": np.arange(150),
            "val": rng.randn(150),
        }
    )
    # one right row per (k, t) so the expected winner is unambiguous
    rt = rt.sort_values(["k", "t", "rid"]).groupby(["k", "t"], as_index=False).last()
    return lt, rt, spark.createDataFrame(lt), spark.createDataFrame(rt)


def _rid_series(df_pd, col):
    return df_pd[col].fillna(-1).astype("int64")


class TestAsofJoin:
    @pytest.mark.parametrize(
        "direction,allow_exact",
        [("backward", True), ("backward", False), ("forward", True)],
    )
    def test_matches_pandas_merge_asof(self, asof_frames, direction, allow_exact):
        lt, rt, ldf, rdf = asof_frames
        got = (
            asof_join(
                ldf,
                rdf,
                on="k",
                left_ts="t",
                right_ts="t",
                right_cols=["rid"],
                direction=direction,
                allow_exact=allow_exact,
            )
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        exp = pd.merge_asof(
            lt.sort_values("t"),
            rt.sort_values("t")[["k", "t", "rid"]],
            on="t",
            by="k",
            direction=direction,
            allow_exact_matches=allow_exact,
        ).sort_values("lid").reset_index(drop=True)
        assert (_rid_series(got, "rid_r") == _rid_series(exp, "rid")).all()
        # left-join semantics: every left row survives exactly once
        assert len(got) == len(lt)

    def test_multiple_right_cols_and_plan(self, asof_frames):
        lt, rt, ldf, rdf = asof_frames
        out = asof_join(
            ldf, rdf, on="k", left_ts="t", right_ts="t", right_cols=["rid", "val"]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        got = out.toPandas()
        # matched rid/val must come from the same right row
        merged = got.merge(rt, left_on=["k", "rid_r"], right_on=["k", "rid"], how="left")
        mask = merged["rid_r"].notna()
        assert np.allclose(merged.loc[mask, "val_r"], merged.loc[mask, "val"])

    def test_bad_direction_rejected(self, asof_frames):
        _, _, ldf, rdf = asof_frames
        with pytest.raises(ValueError, match="direction"):
            asof_join(
                ldf, rdf, on="k", left_ts="t", right_ts="t",
                right_cols=["rid"], direction="nearest",
            )


class TestBucketedRangeJoin:
    @pytest.fixture(scope="class")
    def range_frames(self, spark):
        rng = np.random.RandomState(13)
        pts = pd.DataFrame(
            {
                "k": rng.randint(0, 3, 120),
                "p": rng.randint(0, 500, 120).astype("int64"),
                "pid": np.arange(120),
            }
        )
        ivs = pd.DataFrame(
            {
                "k": rng.randint(0, 3, 40),
                "s": rng.randint(0, 450, 40).astype("int64"),
                "iid": np.arange(40),
            }
        )
        ivs["e"] = ivs["s"] + rng.randint(0, 120, 40)
        return pts, ivs, spark.createDataFrame(pts), spark.createDataFrame(ivs)

    @pytest.mark.parametrize("bucket", [7, 64, 1000])
    def test_matches_naive_join(self, range_frames, bucket):
        """Result is bucket-width-invariant and equals the naive
        inequality join — each matching pair appears exactly once (a
        point lives in exactly one bucket)."""
        pts, ivs, pdf, idf = range_frames
        got = bucketed_range_join(
            pdf, idf, point_col="p", start_col="s", end_col="e",
            bucket=bucket, keys=["k"],
        ).toPandas()
        naive = pts.merge(ivs, on="k").query("s <= p <= e")
        assert sorted(zip(got.pid, got.iid)) == sorted(zip(naive.pid, naive.iid))

    def test_no_keys_and_plan(self, range_frames):
        """Works without an equi-key (bucket alone carries the join) and
        never plans a nested loop."""
        pts, ivs, pdf, idf = range_frames
        out = bucketed_range_join(
            pdf.drop("k"), idf.drop("k"), point_col="p", start_col="s",
            end_col="e", bucket=50,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        naive = pts.drop(columns="k").merge(ivs.drop(columns="k"), how="cross").query(
            "s <= p <= e"
        )
        got = out.toPandas()
        assert sorted(zip(got.pid, got.iid)) == sorted(zip(naive.pid, naive.iid))

    def test_bad_bucket_rejected(self, range_frames):
        _, _, pdf, idf = range_frames
        with pytest.raises(ValueError, match="bucket"):
            bucketed_range_join(
                pdf, idf, point_col="p", start_col="s", end_col="e", bucket=0
            )
