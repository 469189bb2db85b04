"""Data-size (weak) scaling run — fixed cluster, growing input.

The north_rule's two-cluster-size criterion (BENCH/scaling.py) evidences
CORE scaling: same input, 8 vs 32 cores. This script evidences the other
axis a 100 TB deployment needs: DATA scaling — the same one-pass
parse→enrich→route→metrics job on a FIXED 4×8-executor local-cluster
(32 cores, identical to the protocol's 4N config, taskset-pinned) over a
16×-spanning input ladder (default 8M → 32M → 128M rows). A flat
per-row cost (throughput ratio largest/smallest ≥ 0.8) means no stage
is super-linear and no fixed bottleneck (driver collect, single-task
sort, unamortized planning) grows with the data — the property that
lets the 32M-row protocol numbers extrapolate to 100 TB partitions.

Writes BENCH/weak_scaling.json, appends BENCH/weak_scaling_history.jsonl,
and patches a sentinel-marked section into BENCH/BASELINE.md that
BENCH/scaling.py re-applies whenever it regenerates that file.

Run:  python BENCH/weak_scaling.py [--sizes 8000000,32000000,128000000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "BENCH")
sys.path.insert(0, BENCH)
sys.path.insert(0, REPO)

JSON_PATH = os.path.join(BENCH, "weak_scaling.json")
HIST_PATH = os.path.join(BENCH, "weak_scaling_history.jsonl")
SENT_BEGIN = "<!-- WEAK_SCALING:BEGIN -->"
SENT_END = "<!-- WEAK_SCALING:END -->"

EXECS = 4  # 4 × 8 cores — the protocol's 4N config
STEAL_CLEAN_PCT = 2.0
# warmup is one full excluded pass (spins up all 32 Python workers /
# JITs the JVMs); capped so the 128M point doesn't pay a 3-minute
# warmup — 32M rows is ~4000 tasks, far beyond what 32 workers need
WARM_CAP_ROWS = 32_000_000


def _dataset(rows: int) -> str:
    import bench

    bench.SEQ_ROWS = rows
    return bench.ensure_bench_sequences()


def measure(sizes: list[int], trials: int, retries: int) -> dict:
    import scaling

    warm_rows = min(max(sizes), WARM_CAP_ROWS)
    points = []
    for rows in sizes:
        data = _dataset(rows)
        warm = _dataset(min(rows, warm_rows))
        best = None
        for attempt in range(retries + 1):
            r = scaling.run_config(
                EXECS, data, rows, trials, warm_data=warm
            )
            steals = r.get("steals", [0.0] * len(r["times"]))
            clean = [
                t for t, s in zip(r["times"], steals) if s <= STEAL_CLEAN_PCT
            ]
            rec = {
                "rows": rows,
                "times": [round(t, 2) for t in r["times"]],
                "steals": steals,
                "trials_clean": len(clean),
                "rows_routed": r["rows_routed"],
            }
            basis = clean if clean else r["times"]
            rec["basis"] = "median_clean" if clean else "median_all_dirty"
            rec["median_sec"] = round(statistics.median(basis), 2)
            rec["throughput"] = round(rows / rec["median_sec"], 1)
            if best is None or rec["trials_clean"] > best["trials_clean"]:
                best = rec
            if clean:
                break
            print(
                f"rows={rows:,}: all {len(r['times'])} trials dirty "
                f"(steal {steals}); retry {attempt + 1}/{retries}",
                file=sys.stderr,
            )
        points.append(best)
        print(
            f"rows={best['rows']:,}: median={best['median_sec']}s "
            f"thr={best['throughput']:,.0f} seq/s "
            f"({best['trials_clean']}/{len(best['times'])} clean)",
            file=sys.stderr,
        )

    lo, hi = points[0], points[-1]
    ratio = round(hi["throughput"] / lo["throughput"], 3)
    # flatness must hold at EVERY rung, not just the endpoints — a
    # middle point below the bar means some stage went super-linear
    # (or the trial window was contended and should be re-run)
    ratio_min = round(
        min(p["throughput"] / lo["throughput"] for p in points), 3
    )
    return {
        "metric": f"weak scaling (fixed {EXECS}x8 cores, growing input)",
        "points": points,
        "span": round(hi["rows"] / lo["rows"], 1),
        "throughput_ratio_hi_lo": ratio,
        "throughput_ratio_min": ratio_min,
        "acceptance": min(ratio, ratio_min) >= 0.8,
    }


def render_section() -> str:
    """Markdown section from weak_scaling.json ('' if absent)."""
    if not os.path.exists(JSON_PATH):
        return ""
    with open(JSON_PATH) as fh:
        s = json.load(fh)
    rows_md = "\n".join(
        f"| {p['rows']:,} | {p['median_sec']} | {p['throughput']:,} "
        f"| {p['trials_clean']}/{len(p['times'])} | {p['steals']} |"
        for p in s["points"]
    )
    verdict = "PASS" if s["acceptance"] else "FAIL"
    return f"""{SENT_BEGIN}
## Data-size (weak) scaling — fixed 32 cores, growing input

Same one-pass job as the core-scaling protocol, FIXED 4×8-executor
local-cluster (taskset-pinned 32 cores), input grown {s['span']}×.
Flat per-row cost (largest/smallest throughput ratio ≥ 0.8) is the
evidence that no stage is super-linear and no fixed bottleneck grows
with the data — what lets the protocol numbers extrapolate to 100 TB
partition counts. Per-size basis: median over clean (≤2% steal) trials.

| rows | median wall (s) | throughput (seq/s) | clean trials | steal % |
|---|---|---|---|---|
{rows_md}

**Throughput ratio largest ÷ smallest: {s['throughput_ratio_hi_lo']},
worst rung ÷ smallest: {s.get('throughput_ratio_min', s['throughput_ratio_hi_lo'])}
— {verdict}** (BOTH must be ≥ 0.8 — flatness has to hold at every
rung, not just the endpoints; >1.0 means the fixed per-job overhead
amortizes away with size, i.e. big inputs run CHEAPER per row).
{SENT_END}"""


def patch_baseline() -> None:
    """Insert/replace the weak-scaling section in BENCH/BASELINE.md."""
    section = render_section()
    if not section:
        return
    path = os.path.join(BENCH, "BASELINE.md")
    if not os.path.exists(path):
        return
    with open(path) as fh:
        md = fh.read()
    if SENT_BEGIN in md and SENT_END in md:
        head, rest = md.split(SENT_BEGIN, 1)
        _, tail = rest.split(SENT_END, 1)
        md = head + section + tail
    else:
        anchor = "## Why this is a faithful"
        if anchor in md:
            md = md.replace(anchor, section + "\n\n" + anchor, 1)
        else:
            md = md.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as fh:
        fh.write(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8000000,32000000,128000000")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--retries", type=int, default=2)
    args = ap.parse_args()
    sizes = sorted(int(s) for s in args.sizes.split(",") if s)

    summary = measure(sizes, args.trials, args.retries)
    print(json.dumps(summary))
    with open(JSON_PATH, "w") as fh:
        json.dump(summary, fh, indent=1)
    with open(HIST_PATH, "a") as fh:
        fh.write(
            json.dumps({"ts": time.strftime("%Y-%m-%d %H:%M"), **summary})
            + "\n"
        )
    patch_baseline()


if __name__ == "__main__":
    main()
