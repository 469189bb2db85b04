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


class TestSnapshotTable:
    """Snapshot-manifest emulation (round-3 VERDICT #6): time travel,
    incremental scan, and reload semantics over the parquet mirror —
    the call shapes the real Iceberg catalog serves via
    snapshot-id / start-snapshot-id options."""

    def _ids(self, df):
        return sorted(r["doc_id"] for r in df.collect())

    def test_append_time_travel_and_reload(self, spark, tmp_path):
        from txtlogparser_spark.sources.iceberg import SnapshotTable

        t = SnapshotTable(spark, str(tmp_path / "tbl"))
        s1 = t.append(_seqs(spark, "a", n=6))
        s2 = t.append(_seqs(spark, "b", n=6))
        assert (s1, s2) == (1, 2)
        # latest sees both commits; time travel sees only the first
        assert len(self._ids(t.read())) == 12
        assert self._ids(t.read(s1)) == self._ids(_seqs(spark, "a", n=6))
        # reload analog (OutputData.cpp:98-110): a later commit is
        # visible to the next read without reconstructing the table
        t.append(_seqs(spark, "c", n=3))
        assert len(self._ids(t.read())) == 15

    def test_overwrite_starts_fresh_chain(self, spark, tmp_path):
        from txtlogparser_spark.sources.iceberg import SnapshotTable

        t = SnapshotTable(spark, str(tmp_path / "tbl"))
        s1 = t.append(_seqs(spark, "a", n=6))
        s2 = t.overwrite(_seqs(spark, "b", n=4))
        s3 = t.append(_seqs(spark, "c", n=3))
        assert len(self._ids(t.read())) == 7  # overwrite chain only
        assert self._ids(t.read(s1)) == self._ids(_seqs(spark, "a", n=6))
        assert len(self._ids(t.read(s2))) == 4
        ops = {r["snapshot_id"]: r["op"] for r in t.manifest().collect()}
        assert ops == {1: "append", 2: "overwrite", 3: "append"}

    def test_incremental_scan(self, spark, tmp_path):
        from txtlogparser_spark.sources.iceberg import SnapshotTable

        t = SnapshotTable(spark, str(tmp_path / "tbl"))
        s1 = t.append(_seqs(spark, "a", n=6))
        s2 = t.append(_seqs(spark, "b", n=6))
        s3 = t.append(_seqs(spark, "c", n=3))
        inc = t.incremental(s1)
        assert self._ids(inc) == self._ids(
            _seqs(spark, "b", n=6).unionByName(_seqs(spark, "c", n=3))
        )
        assert self._ids(t.incremental(s1, s2)) == self._ids(_seqs(spark, "b", n=6))
        # empty window returns an empty frame with the table schema
        assert t.incremental(s3).count() == 0
        assert t.incremental(s3).columns == t.read().columns

    def test_incremental_refuses_to_cross_overwrite(self, spark, tmp_path):
        from txtlogparser_spark.sources.iceberg import SnapshotTable

        t = SnapshotTable(spark, str(tmp_path / "tbl"))
        s1 = t.append(_seqs(spark, "a", n=6))
        t.overwrite(_seqs(spark, "b", n=4))
        with pytest.raises(ValueError, match="non-append"):
            t.incremental(s1)

    def test_unknown_snapshot_raises(self, spark, tmp_path):
        from txtlogparser_spark.sources.iceberg import SnapshotTable

        t = SnapshotTable(spark, str(tmp_path / "tbl"))
        with pytest.raises(ValueError, match="no commits"):
            t.read()
        t.append(_seqs(spark, "a", n=3))
        with pytest.raises(ValueError, match="unknown snapshot"):
            t.read(99)
        with pytest.raises(ValueError, match="unknown snapshot"):
            t.incremental(99)


class TestSnapshotMaintenance:
    """expire_snapshots / rewrite_data_files: reachability-scoped
    physical deletes, preserved answerable reads, refused invalid
    retention."""

    def _ids(self, df):
        return sorted(r["doc_id"] for r in df.collect())

    def test_expire_keeps_needed_ancestors(self, spark, tmp_path):
        import os

        from txtlogparser_spark.sources.iceberg import SnapshotTable

        t = SnapshotTable(spark, str(tmp_path / "tbl"))
        t.append(_seqs(spark, "a", n=3))      # 1: expired
        t.append(_seqs(spark, "b", n=3))      # 2: expired
        s3 = t.overwrite(_seqs(spark, "c", n=4))  # 3: ancestor of 4,5
        s4 = t.append(_seqs(spark, "d", n=2))
        s5 = t.append(_seqs(spark, "e", n=2))
        before = self._ids(t.read())
        res = t.expire_snapshots(retain_last=2)
        assert res["expired"] == [1, 2]
        # dirs of 1,2 deleted; the overwrite dir survives (4 and 5 read
        # through it) even though snapshot 3 is outside retain_last=2
        assert not os.path.exists(str(tmp_path / "tbl" / "snap-00001"))
        assert not os.path.exists(str(tmp_path / "tbl" / "snap-00002"))
        assert os.path.exists(str(tmp_path / "tbl" / "snap-00003"))
        assert self._ids(t.read()) == before
        assert len(self._ids(t.read(s4))) == 6
        assert len(self._ids(t.read(s3))) == 4  # kept ancestor still answers
        with pytest.raises(ValueError, match="unknown snapshot"):
            t.read(1)
        # incremental over the retained window still works
        assert len(self._ids(t.incremental(s4, s5))) == 2

    def test_expire_noop_and_validation(self, spark, tmp_path):
        from txtlogparser_spark.sources.iceberg import SnapshotTable

        t = SnapshotTable(spark, str(tmp_path / "tbl"))
        t.append(_seqs(spark, "a", n=3))
        assert t.expire_snapshots(retain_last=5)["expired"] == []
        with pytest.raises(ValueError, match="retain_last"):
            t.expire_snapshots(retain_last=0)

    def test_rewrite_then_expire_reclaims_history(self, spark, tmp_path):
        import os

        from txtlogparser_spark.sources.iceberg import SnapshotTable

        t = SnapshotTable(spark, str(tmp_path / "tbl"))
        t.append(_seqs(spark, "a", n=3))
        t.append(_seqs(spark, "b", n=3))
        before = self._ids(t.read())
        sid = t.rewrite_data_files()          # one compacted overwrite
        res = t.expire_snapshots(retain_last=1)
        assert res["expired"] == [1, 2]
        assert self._ids(t.read()) == before
        assert t.current_snapshot() == sid
        left = sorted(
            d for d in os.listdir(str(tmp_path / "tbl")) if d.startswith("snap-")
        )
        assert left == [f"snap-{sid:05d}"]


def test_shared_contract_against_emulation(spark, tmp_path):
    """The emulation passes the literal same behavioral contract the
    env-gated real-catalog suite (test_iceberg_catalog.py) runs — the
    two paths cannot silently diverge on snapshot semantics."""
    from iceberg_contract import ALL_CONTRACTS
    from txtlogparser_spark.sources.iceberg import SnapshotTable

    for contract in ALL_CONTRACTS:
        t = SnapshotTable(spark, str(tmp_path / contract.__name__))
        contract(t, spark)
