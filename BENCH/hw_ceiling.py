"""Same-box compute-scaling ceiling measurement.

The scaling criterion (BASELINE.json north_rule: efficiency ≥ 0.8 going
N → 4N executors) is evidenced in this sandbox by running both cluster
sizes on ONE machine. That makes them share memory bandwidth, cache, and
turbo headroom — so the achievable efficiency is capped below 1.0 by the
HARDWARE, independent of Spark. This script measures that cap: P
share-nothing pinned Python processes each run the identical token-span
workload (the pipeline's only Python stage) on private data; aggregate
throughput at P=8 vs P=32 gives the best any framework could scale this
compute on this box. Real N and 4N clusters are separate machines and do
not share these resources.

Writes BENCH/hw_ceiling.json; BENCH/scaling.py folds it into
BENCH/BASELINE.md when present.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args):
    n_iter, cpu, data = args
    os.sched_setaffinity(0, {cpu})
    sys.path.insert(0, REPO)
    import numpy as np
    import pyarrow.dataset as ds

    from txtlogparser_spark.functions.token_spans import (
        build_word_tables,
        spans_for_ids,
    )
    from txtlogparser_spark.sources.fixtures import build_vocab, default_workspace

    d = ds.dataset(data, format="parquet", partitioning="hive")
    tokens = d.head(20000).column("tokens").to_pylist()
    vocab = build_vocab()
    ws = default_workspace()
    wlen, hc, ff, sf, cf = build_word_tables(
        vocab,
        ws.enabled_filters(),
        ws.enabled_searches(),
        want_search=True,
        want_combined=False,
    )
    nv = len(vocab)
    t0 = time.perf_counter()
    rows = 0
    for _ in range(n_iter):
        for t in tokens:
            ids = np.asarray(t, dtype=np.int64)
            ids = np.where((ids >= 0) & (ids < nv), ids, nv)
            spans_for_ids(
                ids, wlen, hc, ff, sf, cf, want_search=True, want_combined=False
            )
            rows += 1
    return rows / (time.perf_counter() - t0)


def _cpu_stat():
    with open("/proc/stat") as fh:
        vals = [int(x) for x in fh.readline().split()[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def main():
    sys.path.insert(0, REPO)
    import bench

    data = os.path.join(bench.ensure_bench_sequences(), "sequences")
    out = {}
    tot0, st0 = _cpu_stat()
    for P in (8, 32):
        with mp.Pool(P) as pool:
            rates = pool.map(worker, [(2, i, data) for i in range(P)])
        out[P] = round(sum(rates), 1)
        print(f"P={P}: aggregate {out[P]:,.0f} rows/s")
    tot1, st1 = _cpu_stat()
    steal_pct = 100.0 * (st1 - st0) / (tot1 - tot0) if tot1 > tot0 else 0.0
    ceiling = (out[32] / out[8]) / 4
    result = {
        "metric": "same-box compute scaling ceiling (share-nothing pinned processes)",
        "throughput_p8": out[8],
        "throughput_p32": out[32],
        "ceiling_efficiency": round(ceiling, 3),
        "steal_pct": round(steal_pct, 2),
    }
    print(json.dumps(result))
    if steal_pct > 2.0:
        # a ceiling taken under co-tenant steal UNDERSTATES the box (the
        # 32-process config eats the contention disproportionately) and
        # would inflate the normalized gate — refuse to record it
        print(
            f"NOT recording hw_ceiling.json: steal {steal_pct:.1f}% > 2% "
            "(co-tenant contention window); re-run when quiet",
            file=sys.stderr,
        )
        return
    with open(os.path.join(REPO, "BENCH", "hw_ceiling.json"), "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
