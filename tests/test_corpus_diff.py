"""corpus_diff / corpus_diff_summary (operators/diff.py): snapshot
version classification — model parity, digest-column reuse, NULL
digests, identical snapshots, and the thin-projection join plan."""

import pyspark.sql.functions as F
import pytest

from txtlogparser_spark.operators.diff import corpus_diff, corpus_diff_summary


@pytest.fixture(scope="module")
def snaps(spark):
    old = spark.createDataFrame(
        [
            (0, "alpha"),
            (1, "bravo"),
            (2, "charlie"),
            (3, "delta"),
            (4, None),       # NULL text in old
            (5, "echo"),
        ],
        "doc_id LONG, text STRING",
    )
    new = spark.createDataFrame(
        [
            (0, "alpha"),        # unchanged
            (1, "bravo-v2"),     # changed
            (3, "delta"),        # unchanged
            (4, "now-present"),  # changed (NULL digest -> value)
            (6, "foxtrot"),      # added
            # 2, 5 removed
        ],
        "doc_id LONG, text STRING",
    )
    return old, new


def test_statuses(spark, snaps):
    old, new = snaps
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        0: "unchanged",
        1: "changed",
        2: "removed",
        3: "unchanged",
        4: "changed",
        5: "removed",
        6: "added",
    }


def test_summary_zero_fills(spark, snaps):
    old, new = snaps
    got = {
        r["status"]: r["n_docs"]
        for r in corpus_diff_summary(old, new).collect()
    }
    assert got == {"added": 1, "removed": 2, "changed": 2, "unchanged": 2}

    same = {
        r["status"]: r["n_docs"]
        for r in corpus_diff_summary(old, old).collect()
    }
    assert same == {"added": 0, "removed": 0, "changed": 0, "unchanged": 6}


def test_precomputed_digest_column(spark, snaps):
    old, new = snaps
    o = old.withColumn("dg", F.md5("text"))
    n = new.withColumn("dg", F.md5("text"))
    via_digest = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(o, n, digest_col="dg").collect()
    }
    via_text = {
        r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()
    }
    assert via_digest == via_text


def test_join_carries_thin_projection(spark, snaps):
    """Both join inputs must project to (key, digest) BEFORE the
    exchange — the shuffle never carries document payloads."""
    old, new = snaps
    wide_old = old.withColumn("payload", F.repeat(F.lit("x"), 100))
    wide_new = new.withColumn("payload", F.repeat(F.lit("x"), 100))
    plan = (
        corpus_diff(wide_old, wide_new)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "payload" not in plan
    assert (
        plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
    )


def test_diff_between_snapshot_table_versions(spark, tmp_path):
    """corpus_diff over two SnapshotTable reads — the changelog a
    versioned-corpus pipeline actually computes between the snapshot
    it trained on and the current one (time travel supplies 'old')."""
    from txtlogparser_spark.sources.iceberg import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    v1 = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(8)], "doc_id LONG, text STRING"
    )
    s1 = t.overwrite(v1)
    v2 = spark.createDataFrame(
        [(i, f"doc-{i}" + (" v2" if i % 3 == 0 else "")) for i in range(6)]
        + [(100, "fresh")],
        "doc_id LONG, text STRING",
    )
    t.overwrite(v2)

    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(t.read(s1), t.read()).collect()
    }
    assert got == {
        0: "changed", 1: "unchanged", 2: "unchanged", 3: "changed",
        4: "unchanged", 5: "unchanged", 6: "removed", 7: "removed",
        100: "added",
    }
