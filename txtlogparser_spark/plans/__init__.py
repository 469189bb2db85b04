from txtlogparser_spark.plans.pipeline import LogPipeline  # noqa: F401
