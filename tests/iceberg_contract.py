"""Snapshot-table behavioral contract, shared between the parquet-mirror
emulation (sources/iceberg.py::SnapshotTable) and a REAL Iceberg catalog
(tests/test_iceberg_catalog.py, env-gated on the runtime jar).

The contract is expressed over an adapter with the SnapshotTable call
shapes — append(df)->snapshot_id, overwrite(df)->snapshot_id,
read(snapshot_id=None)->DataFrame, incremental(from, to=None)->DataFrame
— and deliberately asserts only engine-portable facts (row sets per
snapshot, chain semantics), never id VALUES: the emulation numbers
snapshots 1..n while Iceberg assigns random longs.

r4 VERDICT #7: writing this contract now means the day a runtime jar is
available, real-catalog parity is one env flag away — both suites run
the literal same assertions.
"""

from __future__ import annotations


def seqs(spark, tag: str, n: int = 12):
    rows = [
        (f"{tag}-{i:04d}", [i, i + 1, i + 2], 3, f"src{i % 3}")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def contract_append_time_travel_reload(adapter, spark) -> None:
    """Appends accumulate; time travel resolves an old snapshot's row
    set; a later commit is visible to the next read without
    reconstructing the table (the reference reload analog,
    OutputData.cpp:98-110)."""
    s1 = adapter.append(seqs(spark, "a", n=6))
    s2 = adapter.append(seqs(spark, "b", n=6))
    assert s2 != s1
    assert len(_ids(adapter.read())) == 12
    assert _ids(adapter.read(s1)) == _ids(seqs(spark, "a", n=6))
    adapter.append(seqs(spark, "c", n=3))
    assert len(_ids(adapter.read())) == 15


def contract_overwrite_fresh_chain(adapter, spark) -> None:
    """Overwrite starts a fresh visible chain; time travel before the
    overwrite still resolves; appends after it accumulate onto it."""
    s1 = adapter.append(seqs(spark, "a", n=6))
    s2 = adapter.overwrite(seqs(spark, "b", n=4))
    adapter.append(seqs(spark, "c", n=3))
    assert len(_ids(adapter.read())) == 7
    assert _ids(adapter.read(s1)) == _ids(seqs(spark, "a", n=6))
    assert len(_ids(adapter.read(s2))) == 4


def contract_incremental_scan(adapter, spark) -> None:
    """incremental(from) returns exactly the rows committed after
    `from`; incremental(from, to) bounds the window; an empty window is
    an empty frame with the table schema."""
    s1 = adapter.append(seqs(spark, "a", n=6))
    s2 = adapter.append(seqs(spark, "b", n=6))
    s3 = adapter.append(seqs(spark, "c", n=3))
    assert _ids(adapter.incremental(s1)) == _ids(
        seqs(spark, "b", n=6).unionByName(seqs(spark, "c", n=3))
    )
    assert _ids(adapter.incremental(s1, s2)) == _ids(seqs(spark, "b", n=6))
    empty = adapter.incremental(s3)
    assert empty.count() == 0
    assert empty.columns == adapter.read().columns


ALL_CONTRACTS = [
    contract_append_time_travel_reload,
    contract_overwrite_fresh_chain,
    contract_incremental_scan,
]
