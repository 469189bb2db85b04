"""Iceberg source/sink (sources/iceberg.py): the container ships no
Iceberg runtime (iceberg_available honestly False), so these tests pin
the parquet-mirror fallback's PARTITION LAYOUT against the documented
Iceberg partition spec (partitionedBy(source) ⇔ source=<v>/ directories)
and the writer's mode semantics, so the catalog branch and the mirror
cannot silently diverge. When a runtime jar appears on the classpath the
same assertions run against the Iceberg path via the location switch."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from txtlogparser_spark.sources.iceberg import (
    iceberg_available,
    read_sequences,
    write_sequences,
)


def _seqs(spark, tag: str, n: int = 12):
    rows = [
        (f"{tag}-{i:04d}", [i, i + 1, i + 2], 3, f"src{i % 3}")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_runtime_absence_is_pinned(spark):
    # documented environment fact; if this flips, the catalog branch is
    # live and must get its own end-to-end test (SURVEY §9 note)
    assert iceberg_available(spark) is False


def test_mirror_partition_layout_matches_spec(spark, tmp_path):
    loc = str(tmp_path / "seqs")
    write_sequences(_seqs(spark, "a"), loc)
    part_dirs = sorted(
        d for d in os.listdir(loc) if d.startswith("source=")
    )
    # one directory per source value, Hive/Iceberg identity-partition form
    assert part_dirs == ["source=src0", "source=src1", "source=src2"]
    for d in part_dirs:
        files = os.listdir(os.path.join(loc, d))
        assert any(f.endswith(".parquet") for f in files)


def test_mirror_roundtrip_and_partition_pruning(spark, tmp_path):
    loc = str(tmp_path / "seqs")
    df = _seqs(spark, "a")
    write_sequences(df, loc)
    back = read_sequences(spark, loc)
    want = {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.collect()
    }
    got = {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in back.collect()
    }
    assert got == want
    # a source predicate must prune to one partition directory, the
    # metadata-pruned-scan analog of Iceberg's partition filtering
    pruned = back.where(F.col("source") == "src1")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "source=src1" in plan.replace("\n", " ") or "PartitionFilters" in plan
    assert pruned.count() == df.where("source = 'src1'").count()


def test_mirror_mode_semantics(spark, tmp_path):
    loc = str(tmp_path / "seqs")
    write_sequences(_seqs(spark, "a"), loc)
    n1 = read_sequences(spark, loc).count()
    write_sequences(_seqs(spark, "b"), loc, mode="append")
    assert read_sequences(spark, loc).count() == 2 * n1
    write_sequences(_seqs(spark, "c", n=6), loc, mode="overwrite")
    assert read_sequences(spark, loc).count() == 6
    with pytest.raises(ValueError):
        write_sequences(_seqs(spark, "d"), loc, mode="error")
