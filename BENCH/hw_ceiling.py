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


# Loaded ONCE in the parent before the Pool forks; children inherit via
# copy-on-write. Per-process numpy/pyarrow import + parquet read + table
# build used to dominate the probe (~5 min for a ~1 min measurement),
# which made per-pair probes from scaling.py unaffordable.
_CTX: dict = {}


def _preload(data: str) -> None:
    if _CTX.get("data") == data:
        return
    sys.path.insert(0, REPO)
    import numpy as np
    import pyarrow.dataset as ds

    from txtlogparser_spark.functions.token_spans import build_word_tables
    from txtlogparser_spark.sources.fixtures import build_vocab, default_workspace

    d = ds.dataset(data, format="parquet", partitioning="hive")
    tokens = d.head(20000).column("tokens").to_pylist()
    vocab = build_vocab()
    ws = default_workspace()
    tables = build_word_tables(
        vocab,
        ws.enabled_filters(),
        ws.enabled_searches(),
        want_search=True,
        want_combined=False,
    )
    nv = len(vocab)
    ids_list = [
        np.where((a >= 0) & (a < nv), a, nv)
        for a in (np.asarray(t, dtype=np.int64) for t in tokens)
    ]
    _CTX.update({"data": data, "ids": ids_list, "tables": tables})


def worker(args):
    n_iter, cpu = args
    os.sched_setaffinity(0, {cpu})
    from txtlogparser_spark.functions.token_spans import spans_for_ids

    wlen, hc, ff, sf, cf = _CTX["tables"]
    ids_list = _CTX["ids"]
    t0 = time.perf_counter()
    rows = 0
    for _ in range(n_iter):
        for ids in ids_list:
            spans_for_ids(
                ids, wlen, hc, ff, sf, cf, want_search=True, want_combined=False
            )
            rows += 1
    return rows / (time.perf_counter() - t0)


def _cpu_stat():
    # same reader as bench.py/_cpu_stat and scaling.py's TRIAL_CODE
    # template (the template must stay self-contained for its
    # subprocess); degrade to (0,0) like bench does instead of letting
    # a transient /proc read error kill a ceiling probe
    try:
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except Exception:
        return 0, 0


def measure(n_iter: int = 2, data: str | None = None, repeats: int = 2) -> dict:
    """One ceiling measurement: interleaved P=8 / P=32 share-nothing
    pinned-process legs running the pipeline's per-row compute; returns
    the result dict WITHOUT recording it. Callable from BENCH/scaling.py
    for per-pair same-window normalization (a ceiling measured hours
    earlier is stale under minute-scale co-tenant drift).

    Each leg is ~10 s, short enough that ONE co-tenant burst hitting one
    leg skews the ratio badly (observed in-protocol: 'ceilings' of 1.140
    and 0.633 in the same run — both physically impossible readings of a
    fixed hardware bound). Defense: run `repeats` interleaved rounds of
    both levels and take the BEST aggregate per level — noise only ever
    subtracts throughput, so per-level max is the least-contended
    estimate and a burst must hit every leg of a level to survive."""
    sys.path.insert(0, REPO)
    if data is None:
        import bench

        data = os.path.join(bench.ensure_bench_sequences(), "sequences")
    _preload(data)
    best = {8: 0.0, 32: 0.0}
    tot0, st0 = _cpu_stat()
    for _ in range(repeats):
        for P in (8, 32):
            with mp.Pool(P) as pool:
                rates = pool.map(worker, [(n_iter, i) for i in range(P)])
            best[P] = max(best[P], round(sum(rates), 1))
    tot1, st1 = _cpu_stat()
    steal_pct = 100.0 * (st1 - st0) / (tot1 - tot0) if tot1 > tot0 else 0.0
    ceiling = (best[32] / best[8]) / 4
    return {
        "metric": "same-box compute scaling ceiling (share-nothing pinned processes)",
        "throughput_p8": best[8],
        "throughput_p32": best[32],
        "ceiling_efficiency": round(ceiling, 3),
        "steal_pct": round(steal_pct, 2),
    }


def main():
    result = measure(n_iter=2)
    print(f"P=8: aggregate {result['throughput_p8']:,.0f} rows/s")
    print(f"P=32: aggregate {result['throughput_p32']:,.0f} rows/s")
    steal_pct = result["steal_pct"]
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
