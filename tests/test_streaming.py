"""Streaming/batch parity: the availableNow stream over the same input
must produce identical routed rows and exact aggregate totals."""

import pytest

from txtlogparser_spark.plans.pipeline import LogPipeline
from txtlogparser_spark.sources.fixtures import (
    FixtureSpec,
    build_vocab,
    default_workspace,
    write_fixture_tables,
)
from txtlogparser_spark.streaming.stream import StreamingLogPipeline

SPEC = FixtureSpec(n_rows=2_000, n_sources=4, seed=11, max_tok=30)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_fixture")
    # unpartitioned layout: the file-arrival streaming source reads a flat
    # directory; partition-dir streaming needs basePath config — batch
    # parity is what's under test here
    write_fixture_tables(str(d), SPEC, partition_by_source=False)
    return str(d)


def test_stream_matches_batch(spark, data_dir, tmp_path):
    vocab = build_vocab()
    info = spark.read.parquet(f"{data_dir}/source_info.parquet")
    pipe = LogPipeline(spark, default_workspace(), vocab, source_info=info)

    batch_routed = pipe.run(pipe.load_sequences(f"{data_dir}/sequences")).persist()
    batch_ids = sorted(r["doc_id"] for r in batch_routed.select("doc_id").collect())
    batch_counts = {
        r["filter_id"]: (r["occurrence_count"], r["line_count"])
        for r in pipe.filter_counts(batch_routed).collect()
    }
    batch_routed.unpersist()

    out = str(tmp_path / "stream_out")
    s = StreamingLogPipeline(pipe)
    q = s.start(f"{data_dir}/sequences", out, available_now=True)
    q.awaitTermination(300)

    got_routed = spark.read.parquet(f"{out}/routed")
    got_ids = sorted(r["doc_id"] for r in got_routed.select("doc_id").collect())
    assert got_ids == batch_ids

    totals = {
        r["filter_id"]: (r["occurrence_count"], r["line_count"])
        for r in StreamingLogPipeline.filter_totals(spark, out).collect()
    }
    assert totals == batch_counts
