from txtlogparser_spark.streaming.stream import StreamingLogPipeline  # noqa: F401
