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


def test_batch_replay_is_idempotent(spark, data_dir, tmp_path):
    """foreachBatch is at-least-once: re-running the SAME batch_id (the
    crash-between-writes replay) must rewrite its own partition, not
    append a duplicate — routed rows stay single-copy and filter_totals
    stays exact (review finding: two non-atomic appends double-counted
    on replay)."""
    vocab = build_vocab()
    info = spark.read.parquet(f"{data_dir}/source_info.parquet")
    pipe = LogPipeline(spark, default_workspace(), vocab, source_info=info)
    out = str(tmp_path / "replay_out")
    writer = StreamingLogPipeline(pipe).batch_writer(out)

    batch_df = pipe.load_sequences(f"{data_dir}/sequences")
    writer(batch_df, 7)
    once_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/routed").select("doc_id").collect()
    )
    once_totals = {
        r["filter_id"]: (r["occurrence_count"], r["line_count"])
        for r in StreamingLogPipeline.filter_totals(spark, out).collect()
    }
    assert once_ids

    # replay the same batch — a restart after a partial failure
    writer(batch_df, 7)
    again_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/routed").select("doc_id").collect()
    )
    again_totals = {
        r["filter_id"]: (r["occurrence_count"], r["line_count"])
        for r in StreamingLogPipeline.filter_totals(spark, out).collect()
    }
    assert again_ids == once_ids, "replay must not duplicate routed rows"
    assert again_totals == once_totals, "replay must not inflate totals"

    # a NEW batch id still accumulates
    writer(batch_df.limit(50), 8)
    n_total = spark.read.parquet(f"{out}/routed").count()
    assert n_total > len(once_ids)
