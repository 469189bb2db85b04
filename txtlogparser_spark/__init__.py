"""txtlogparser_spark — a PySpark-native log parse→enrich→route→aggregate engine.

Brand-new engine with the query semantics of paneltree/TxtLogParser (the
reference, a C++17/Qt6 desktop log viewer) re-expressed Spark-first:

- input: table of pre-tokenized sequences
  ``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``
- detokenize: vectorized pandas/Arrow UDF (tokens → text, reference line-scrub
  semantics, OutputData.cpp:78-90)
- route: filter workspace semantics (FilterData.cpp:110-238) compiled to Spark
  SQL predicates + one vectorized span-extraction UDF
- enrich: broadcast hash join against a source-keyed lookup table
- aggregate: per-filter/search occurrence + line counts (OutputData.cpp:311-318)
- sinks: per-route partitioned parquet/Iceberg writes with lineage + metrics

No per-row Python anywhere: every stage is DataFrame-native or Arrow-batched.
"""

__version__ = "0.1.0"
