"""Scale/ops tests (SURVEY.md §5.5): checkpoint resume equivalence —
kill after K batches, resume same run_id, sinks identical to an
uninterrupted run."""

import pytest

from txtlogparser_spark.config import WorkspaceConfig, FilterSpec
from txtlogparser_spark.plans.lineage import CheckpointedRunner
from txtlogparser_spark.plans.pipeline import LogPipeline
from txtlogparser_spark.sources.fixtures import (
    FixtureSpec,
    build_vocab,
    default_workspace,
    write_fixture_tables,
)

SPEC = FixtureSpec(n_rows=3_000, n_sources=8, seed=7, max_tok=30)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("lineage_fixture")
    write_fixture_tables(str(d), SPEC)
    return str(d)


def make_build(spark, data_dir):
    vocab = build_vocab()
    info = spark.read.parquet(f"{data_dir}/source_info.parquet")
    pipe = LogPipeline(spark, default_workspace(), vocab, source_info=info)

    def build(batch_sources):
        import pyspark.sql.functions as F

        # isin on the partition column → partition pruning, only the
        # batch's directories are scanned
        seqs = pipe.load_sequences(f"{data_dir}/sequences").where(
            F.col("source").isin(batch_sources)
        )
        return pipe.run(seqs)

    return build


SOURCES = [f"src{s:02d}" for s in range(SPEC.n_sources)]


def sink_fingerprint(df):
    import pyspark.sql.functions as F

    rows = df.select("doc_id").orderBy("doc_id").collect()
    return [r["doc_id"] for r in rows]


class TestResume:
    def test_interrupted_resume_equals_uninterrupted(self, spark, tmp_path, data_dir):
        build = make_build(spark, data_dir)

        full = CheckpointedRunner(spark, "run_a", str(tmp_path / "full"))
        n_full = full.run(SOURCES, build, batch_size=2)
        assert n_full == 4

        part = CheckpointedRunner(spark, "run_b", str(tmp_path / "part"))
        with pytest.raises(RuntimeError, match="injected failure"):
            part.run(SOURCES, build, batch_size=2, fail_after=2)
        # resume: completed batches are skipped via lineage anti-join
        resumed = CheckpointedRunner(spark, "run_b", str(tmp_path / "part"))
        n_rest = resumed.run(SOURCES, build, batch_size=2)
        assert n_rest == 2

        assert sink_fingerprint(full.sink()) == sink_fingerprint(resumed.sink())

    def test_lineage_rows_recorded(self, spark, tmp_path, data_dir):
        build = make_build(spark, data_dir)
        r = CheckpointedRunner(spark, "run_c", str(tmp_path / "c"))
        r.run(SOURCES, build, batch_size=4)
        lin = r.lineage().where("run_id = 'run_c'").collect()
        assert len(lin) == 2
        assert all(row["status"] == "done" for row in lin)
        assert all(row["checksum"] is not None for row in lin)
        # rerun is a no-op (all batches done)
        assert r.run(SOURCES, build, batch_size=4) == 0


def test_rebatch_leaves_no_stale_sink_dirs(spark, tmp_path):
    """Changing batch_size between invocations must not leave stale
    batch dirs that duplicate rows in the sink (review finding)."""
    from txtlogparser_spark.plans.lineage import CheckpointedRunner

    out = str(tmp_path / "out")

    def build(batch):
        return spark.createDataFrame(
            [(f"{s}-{i}", s) for s in batch for i in range(3)],
            "doc_id string, source string",
        )

    sources = [f"s{i}" for i in range(8)]
    r1 = CheckpointedRunner(spark, "runA", out)
    r1.run(sources, build, batch_size=2)  # 4 batches
    assert r1.sink().count() == 24

    r2 = CheckpointedRunner(spark, "runB", out)
    r2.run(sources, build, batch_size=4)  # 2 batches, different split
    assert r2.sink().count() == 24  # no duplicated rows from stale dirs


def test_partial_source_invocation_keeps_done_dirs(spark, tmp_path):
    """An invocation over a PARTIAL source list (only newly arrived
    sources) must not delete completed batch dirs from prior
    invocations — their lineage rows still read 'done' and sink() must
    keep serving them (round-3 ADVICE, medium)."""
    from txtlogparser_spark.plans.lineage import CheckpointedRunner

    out = str(tmp_path / "out")

    def build(batch):
        return spark.createDataFrame(
            [(f"{s}-{i}", s) for s in batch for i in range(3)],
            "doc_id string, source string",
        )

    r1 = CheckpointedRunner(spark, "runA", out)
    r1.run(["a", "b", "c", "d"], build, batch_size=2)  # 2 done batches
    assert r1.sink().count() == 12

    # later: only the new sources arrive
    r2 = CheckpointedRunner(spark, "runB", out)
    r2.run(["e", "f"], build, batch_size=2)
    assert r2.sink().count() == 18  # prior done batches survived
    # done rows across runs all still resolve to live dirs
    done = {
        r["batch"]
        for r in r2.lineage().where("status = 'done'").select("batch").collect()
    }
    assert done == {"a,b", "c,d", "e,f"}

    # a genuinely stale dir (never completed, not in this run) is removed
    import os

    stale = os.path.join(out, "sink", "batch=deadbeef0000")
    os.makedirs(stale, exist_ok=True)
    r3 = CheckpointedRunner(spark, "runC", out)
    r3.run(["g", "h"], build, batch_size=2)
    assert r3.sink().count() == 24
    assert not os.path.isdir(stale)
