"""Slab-chunked fixture generation (sources/fixtures.py).

A 128M-row weak-scaling dataset cannot be generated as ONE Arrow slab:
the list offsets are int32 (~7.9G tokens > 2^31) and the float64 masks
would allocate ~60GB. write_fixture_tables therefore chunks specs past
SINGLE_SLAB_MAX_ROWS into SLAB_ROWS slabs with per-source line-number
carry. These tests pin the three contracts that make that safe:

  1. the <=32M single-shot path is untouched (the core-scaling protocol's
     recorded datasets keep regenerating byte-identically);
  2. chunked output has unique doc_ids with contiguous per-source line
     numbers (the (source, line_no) key every downstream op relies on);
  3. the single-slab offset-overflow guard fails loudly instead of
     producing a corrupt table.
"""

import os
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

import txtlogparser_spark.sources.fixtures as fx


def test_small_spec_stays_single_slab(tmp_path, monkeypatch):
    """Specs at or under the threshold never enter the chunked path."""
    calls = []
    orig = fx._generate_slab

    def spy(spec, line_start=None):
        calls.append((spec.n_rows, spec.seed))
        return orig(spec, line_start)

    monkeypatch.setattr(fx, "_generate_slab", spy)
    fx.write_fixture_tables(str(tmp_path), fx.FixtureSpec(n_rows=5_000, seed=3))
    assert calls == [(5_000, 3)]
    t = pq.read_table(os.path.join(str(tmp_path), "sequences"))
    assert t.num_rows == 5_000


def test_chunked_generation_unique_contiguous_ids(tmp_path, monkeypatch):
    """Past the threshold: multiple slabs, unique doc_ids, per-source
    line numbers contiguous from 0 — on both dataset layouts."""
    monkeypatch.setattr(fx, "SINGLE_SLAB_MAX_ROWS", 10_000)
    monkeypatch.setattr(fx, "SLAB_ROWS", 4_000)
    for partitioned in (True, False):
        out = str(tmp_path / f"p{partitioned}")
        fx.write_fixture_tables(
            out,
            fx.FixtureSpec(n_rows=11_000, n_sources=4, seed=7, hot_fraction=0.5),
            partition_by_source=partitioned,
        )
        t = pq.read_table(os.path.join(out, "sequences"))
        assert t.num_rows == 11_000
        ids = t.column("doc_id").to_pylist()
        assert len(set(ids)) == 11_000, "doc_id must stay unique across slabs"
        per = defaultdict(list)
        for i in ids:
            s, ln = i.split("-")
            per[s].append(int(ln))
        assert len(per) == 4
        for s, lns in per.items():
            assert sorted(lns) == list(range(len(lns))), s


def test_single_slab_offset_overflow_guard():
    """generate_sequences refuses specs whose token total would overflow
    the int32 Arrow list offsets instead of corrupting the table."""
    with pytest.raises(ValueError, match="int32 list offsets"):
        fx.generate_sequences(fx.FixtureSpec(n_rows=128_000_000))


def test_rerun_overwrites_instead_of_appending(tmp_path):
    """Review finding: a second write_fixture_tables over the same
    out_dir silently doubled every sequences row (slab appends) while
    source_info was overwritten — now the sequences dir is rebuilt."""
    spec = fx.FixtureSpec(n_rows=500, n_sources=2, seed=5)
    seq, _ = fx.write_fixture_tables(str(tmp_path), spec)
    n1 = pq.read_table(seq).num_rows
    fx.write_fixture_tables(str(tmp_path), spec)
    n2 = pq.read_table(seq).num_rows
    assert n1 == n2 == 500


def test_slab_plan_is_token_aware():
    """int32 list-offset overflow is TOKEN-count driven: wide-token
    specs must chunk below the 32M-row bound, and the slab size must
    shrink so one slab stays under the offset budget."""
    # default widths, small rows: single shot (history datasets)
    chunked, _ = fx._slab_plan(fx.FixtureSpec(n_rows=32_000_000))
    assert not chunked
    # 20M rows x ~150 avg tokens = 3.0e9 > 2^31: must chunk, and each
    # slab must fit the budget
    spec = fx.FixtureSpec(n_rows=20_000_000, min_tok=100, max_tok=200)
    chunked, slab_rows = fx._slab_plan(spec)
    assert chunked
    assert slab_rows * 150 < 2**31 - 1
    # row-driven chunking still applies at default widths
    chunked, slab_rows = fx._slab_plan(fx.FixtureSpec(n_rows=64_000_000))
    assert chunked and slab_rows == fx.SLAB_ROWS
