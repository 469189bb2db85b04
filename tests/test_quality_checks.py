

class TestThresholdSweep:
    def test_matches_model(self, spark):
        from txtlogparser_spark.operators.quality_checks import (
            threshold_sweep,
        )

        scores = [0.1, 0.45, 0.5, 0.72, 0.9, 0.9, 0.33]
        df = spark.createDataFrame([(s,) for s in scores], ["score"])
        ts = [0.3, 0.5, 0.9]
        got = {
            r["threshold"]: (r["n_keep"], r["keep_rate"])
            for r in threshold_sweep(df, "score", ts).collect()
        }
        n = len(scores)
        want = {
            t: (
                sum(1 for s in scores if s >= t),
                round(sum(1 for s in scores if s >= t) / n, 6),
            )
            for t in ts
        }
        assert got == want

    def test_one_pass_scalar_aggregate(self, spark):
        """The whole sweep must be ONE keyless aggregate over one scan —
        no per-threshold corpus pass."""
        from txtlogparser_spark.operators.quality_checks import (
            threshold_sweep,
        )

        df = spark.createDataFrame([(0.5,)], ["score"])
        plan = (
            threshold_sweep(df, "score", [0.1, 0.5, 0.9])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Scan ExistingRDD") == 1

    def test_empty_input_and_validation(self, spark):
        import pytest as _pytest

        from txtlogparser_spark.operators.quality_checks import (
            threshold_sweep,
        )

        empty = spark.createDataFrame([], "score double")
        got = threshold_sweep(empty, "score", [0.5]).collect()
        assert len(got) == 1
        assert got[0]["n_keep"] == 0 and got[0]["keep_rate"] is None
        with _pytest.raises(ValueError):
            threshold_sweep(empty, "score", [])
