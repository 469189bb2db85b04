"""Deterministic fixture generator for the tokenized-sequence input table.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
  sequences(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)
  source_info(source, source_rank, selected, host, env)

Content recipe (FIXTURES.md §1) exercises every matcher path: log levels
with mixed-case variants (ASCII case folding, FilterData.cpp:114-117),
underscore tokens (isalnum vs \\b whole-word divergence, FilterData.cpp:126-128
vs :167), repeated-substring tokens for the greedy non-overlapping scan
quirk (FilterData.cpp:150), numeric fields for regex capture, and
overlap-bait lines for first-match-wins + search overlay.

All generation is numpy-vectorized and seeded: same (spec, seed) ⇒
byte-identical tables at any scale, which also makes checkpoint-resume
tests reproducible. Skew: `hot_fraction` of rows land in source 0 to
exercise salted repartitioning (SURVEY.md §4 custom-work #2).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from txtlogparser_spark.config import FilterSpec, SearchSpec, WorkspaceConfig

VOCAB_SIZE = 4096

# Slab-chunked generation thresholds (write_fixture_tables): one slab of
# 128M rows would overflow int32 Arrow list offsets (~7.9G tokens > 2^31)
# and allocate ~60GB of float64 masks. SINGLE_SLAB_MAX_ROWS is deliberately
# 32M: every dataset the core-scaling protocol has ever recorded (<=32M)
# keeps generating single-shot, byte-identical to the history runs.
SINGLE_SLAB_MAX_ROWS = 32_000_000
SLAB_ROWS = 16_000_000

# Words that the fixture filters/searches target (FIXTURES.md §3).
_INTERESTING = [
    "ERROR", "Error", "error", "WARN", "warn", "Warn", "INFO", "DEBUG", "TRACE",
    "conn_error", "_retry_", "retry", "timeout", "aaa", "abab", "aa",
    "latency=123ms", "latency=7ms", "latency=4567ms", "code=200", "code=404",
    "code=500", "request", "response", "GET", "POST", "user", "session",
    "db_conn_error", "warning", "errors",
]


def build_vocab(size: int = VOCAB_SIZE) -> List[str]:
    filler = [f"w{i:04d}" for i in range(size - len(_INTERESTING))]
    return _INTERESTING + filler


@dataclass(frozen=True)
class FixtureSpec:
    n_rows: int = 50_000
    n_sources: int = 8
    seed: int = 42
    min_tok: int = 3
    max_tok: int = 120
    hot_fraction: float = 0.0  # fraction of rows forced into source 0
    interesting_rate: float = 0.25  # per-token prob of an interesting word
    # fraction of rows with an EMPTY token array (n_tok=0). Reference
    # semantics make empty lines a real shape: the line vanishes after
    # the first non-claiming filter, while a zero-width-first regex
    # claims it (FilterData.cpp:154-159/221-229) — the r4 token-path
    # parity bug lived exactly here. Default 0.0 keeps generation
    # byte-identical to every recorded scaling dataset.
    empty_fraction: float = 0.0


def _generate_slab(
    spec: FixtureSpec, line_start: np.ndarray | None = None
) -> Tuple[pa.Table, np.ndarray]:
    """One vectorized slab of the sequences table. `line_start` carries
    per-source line-number offsets across slabs so chunked generation
    (write_fixture_tables on >32M rows) keeps doc_id unique corpus-wide.
    Returns (table, updated per-source counters)."""
    rng = np.random.RandomState(spec.seed)
    n = spec.n_rows
    n_int = len(_INTERESTING)

    # source assignment (with optional hot-source skew)
    src_idx = rng.randint(0, spec.n_sources, size=n)
    if spec.hot_fraction > 0:
        hot = rng.rand(n) < spec.hot_fraction
        src_idx = np.where(hot, 0, src_idx)

    n_tok = rng.randint(spec.min_tok, spec.max_tok + 1, size=n).astype(np.int32)
    if spec.empty_fraction > 0:
        # drawn only when requested so the default path's rng stream —
        # and hence every historical dataset — stays byte-identical
        n_tok[rng.rand(n) < spec.empty_fraction] = 0
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    total = int(offsets[-1])
    if total > 2**31 - 1:
        # _slab_plan sizes slabs from the AVERAGE token width with ~2%
        # headroom; a high-variance draw could still overflow Arrow's
        # int32 list offsets — fail loudly instead of writing a corrupt
        # ListArray (ADVICE r4)
        raise ValueError(
            f"slab token total {total} overflows int32 list offsets; "
            f"lower slab rows for this spec"
        )

    # token stream: filler words by default, interesting words at a fixed rate
    values = rng.randint(n_int, VOCAB_SIZE, size=total)
    mask = rng.rand(total) < spec.interesting_rate
    values[mask] = rng.randint(0, n_int, size=int(mask.sum()))
    values = values.astype(np.int32)

    # per-source running line numbers → doc_id "{source}-{line_no:08d}"
    base = (
        np.zeros(spec.n_sources, dtype=np.int64)
        if line_start is None
        else line_start.astype(np.int64)
    )
    line_no = np.zeros(n, dtype=np.int64)
    counters = base.copy()
    for s in range(spec.n_sources):
        sel = src_idx == s
        cnt = int(sel.sum())
        line_no[sel] = base[s] + np.arange(cnt)
        counters[s] = base[s] + cnt
    sources = np.array([f"src{s:02d}" for s in range(spec.n_sources)])
    src_col = sources[src_idx]
    doc_id = np.char.add(
        np.char.add(src_col, "-"),
        np.char.zfill(line_no.astype(str), 8),
    )

    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
    )
    table = pa.table(
        {
            "doc_id": pa.array(doc_id.tolist(), type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(src_col.tolist(), type=pa.string()),
        }
    )
    return table, counters


def generate_sequences(spec: FixtureSpec) -> pa.Table:
    """Vectorized generation of the sequences table as one Arrow table.

    Single-shot only: one slab's list offsets are int32, so total tokens
    must stay under 2^31 (n_rows ≲ 32M at the default 3-120 token range).
    write_fixture_tables chunks past that; this function guards loudly."""
    est_total = spec.n_rows * (spec.min_tok + spec.max_tok) / 2
    if est_total > 2**31 - 1:
        raise ValueError(
            f"single-slab generation would overflow int32 list offsets "
            f"(~{est_total / 1e9:.1f}G tokens); use write_fixture_tables, "
            f"which chunks large specs"
        )
    table, _ = _generate_slab(spec)
    return table


def generate_source_info(spec: FixtureSpec) -> pa.Table:
    """One row per source; source_rank is a deterministic non-identity
    permutation (FIXTURES.md §2) so order-sensitivity is actually tested."""
    rng = np.random.RandomState(spec.seed + 1)
    n = spec.n_sources
    rank = rng.permutation(n)
    envs = np.array(["prod", "staging", "dev"])
    return pa.table(
        {
            "source": pa.array([f"src{s:02d}" for s in range(n)]),
            "source_rank": pa.array(rank, type=pa.int32()),
            "selected": pa.array([True] * n),
            "host": pa.array([f"host-{s % 4}" for s in range(n)]),
            "env": pa.array(envs[rng.randint(0, 3, size=n)].tolist()),
        }
    )


def default_workspace() -> WorkspaceConfig:
    """The FIXTURES.md §3 workspace: both matcher modes × both flag axes,
    a disabled filter, and overlapping filter/search patterns."""
    return WorkspaceConfig(
        id=1,
        name="fixture-ws",
        filters=[
            FilterSpec(201, 0, "ERROR", caseSensitive=True, wholeWord=False, regex=False, color="#F44336"),
            FilterSpec(202, 1, "warn", caseSensitive=False, wholeWord=True, regex=False, color="#DFEE15"),
            FilterSpec(203, 2, r"code=\d+", caseSensitive=False, wholeWord=False, regex=True, color="#37B027"),
            FilterSpec(204, 3, "conn_error", caseSensitive=False, wholeWord=True, regex=True, color="#187DCA"),
            FilterSpec(205, 4, "TRACE", caseSensitive=True, wholeWord=False, regex=False, enabled=False, color="#CA692D"),
        ],
        searches=[
            SearchSpec(301, 0, "latency", caseSensitive=False, wholeWord=False, regex=False, color="#2195F3"),
            SearchSpec(302, 1, r"\d+ms", caseSensitive=False, wholeWord=False, regex=True, color="#03F4D8"),
        ],
    ).validate()


def _write_slab(
    seq: pa.Table, seq_path: str, partition_by_source: bool, row_group_rows: int
) -> None:
    """Append one generated slab to the dataset (uuid part filenames, so
    successive slabs never clobber each other)."""
    if partition_by_source:
        pq.write_to_dataset(
            seq,
            seq_path,
            partition_cols=["source"],
            max_rows_per_group=row_group_rows,
            min_rows_per_group=min(row_group_rows, 4096),
        )
    else:
        os.makedirs(seq_path, exist_ok=True)
        part = len([f for f in os.listdir(seq_path) if f.endswith(".parquet")])
        pq.write_table(
            seq,
            os.path.join(seq_path, f"part-{part}.parquet"),
            row_group_size=row_group_rows,
        )


def _slab_plan(spec: FixtureSpec) -> Tuple[bool, int]:
    """(chunk?, slab_rows): the overflow being guarded is TOKEN-count
    driven (int32 Arrow list offsets, ~2.1G tokens/slab), so wide-token
    specs must chunk even under the 32M-row bound, and the slab size
    itself shrinks so no slab exceeds the offset budget. Default-width
    specs <= 32M rows stay single-shot — byte-identical to every
    recorded scaling dataset."""
    # budget just under 2^31-1: the margin must stay small enough that
    # the recorded scaling datasets (32M rows x 61.5 avg default tokens
    # = 1.97G) keep generating single-shot, byte-identical to history
    budget = 2_100_000_000
    avg_tok = (spec.min_tok + spec.max_tok) / 2.0
    token_safe_rows = max(1, int(budget / max(avg_tok, 1.0)))
    chunked = spec.n_rows > SINGLE_SLAB_MAX_ROWS or spec.n_rows > token_safe_rows
    return chunked, min(SLAB_ROWS, token_safe_rows)


def write_fixture_tables(
    out_dir: str,
    spec: FixtureSpec,
    *,
    partition_by_source: bool = True,
    row_group_rows: int = 32_768,
) -> Tuple[str, str]:
    """Write sequences (partitioned by source — the Iceberg partition-spec
    analog enabling partition pruning on source selection) + source_info.

    `row_group_rows` bounds parquet row-group size: Spark splits files at
    row-group granularity, so a hot source written as one giant row group
    would serialize the whole scan+UDF stage into a single task (observed
    10-30x slowdown). Small row groups keep even a 50%-hot source
    splittable across executors with no repartition shuffle — the same
    reason Iceberg targets many row groups per 128MB file."""
    os.makedirs(out_dir, exist_ok=True)
    seq_path = os.path.join(out_dir, "sequences")
    if os.path.isdir(seq_path):
        # overwrite, never append: _write_slab appends parts (so
        # successive SLABS don't clobber each other), which made a
        # re-run over an existing dir silently DOUBLE every row while
        # source_info was overwritten — a half-stale corrupt fixture
        # violating the same-(spec,seed)=>identical-tables contract
        import shutil

        shutil.rmtree(seq_path)

    # Slab-chunked generation past the single-slab bound (rationale at
    # the SINGLE_SLAB_MAX_ROWS definition).
    chunked, slab_rows = _slab_plan(spec)
    if chunked:
        from dataclasses import replace

        counters: np.ndarray | None = None
        done = 0
        slab_idx = 0
        while done < spec.n_rows:
            n = min(slab_rows, spec.n_rows - done)
            sub = replace(spec, n_rows=n, seed=spec.seed + 1000 * slab_idx)
            slab, counters = _generate_slab(sub, counters)
            _write_slab(slab, seq_path, partition_by_source, row_group_rows)
            done += n
            slab_idx += 1
    else:
        _write_slab(
            generate_sequences(spec), seq_path, partition_by_source, row_group_rows
        )
    info_path = os.path.join(out_dir, "source_info.parquet")
    pq.write_table(generate_source_info(spec), info_path)
    return seq_path, info_path
