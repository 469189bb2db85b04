"""AQE runtime re-planning evidence (the brief's third skew tactic,
alongside the pipeline's salted repartition and the bucketed storage
layout): a 95%-hot-key shuffle join, executed under AQE with scaled
thresholds, must be rewritten at RUNTIME into a skew-split merge join —
`SortMergeJoin(skew=true)` reading `AQEShuffleRead ... skewed` — i.e.
the hot partition is split across tasks instead of serializing on one.

The assert reads the FINAL adaptive plan of the executed DataFrame
(isFinalPlan=true); inspecting before execution, or executing a
different derived plan like df.count(), shows the undecided wrapper and
proves nothing (the same AQE pitfall tools/explain_audit.py and
tests/test_bucketed.py document from the other direction).
"""

from contextlib import contextmanager

import pyspark.sql.functions as F

SKEW_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # fixture-scale thresholds: production defaults (256MB advisory /
    # 5x factor) with the same ratios, shrunk so a ~13MB hot partition
    # is "skewed" relative to its siblings
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    # the dim would broadcast (also fine at scale, but then there is no
    # shuffle to skew-split and the test proves nothing)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _confs(spark, kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_hot_key_join(spark):
    with _confs(spark, SKEW_CONF):
        # key 0 carries 95% of 200k fat rows; the dim has 1000 keys
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias(
                "payload"
            ),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k").select(
            F.sum(F.length("payload")).alias("s")
        )
        [row] = j.collect()  # finalize THIS plan
        plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
    assert any(
        "AQEShuffleRead" in ln and "skewed" in ln for ln in plan.splitlines()
    ), plan[:2000]
    # and the rewrite preserved the join result
    assert row["s"] == 13888890
