"""Two-cluster-size scaling run (BASELINE.md protocol / north_rule).

Runs the identical parse→enrich→route→aggregate job on the same input at
local[8] and local[32] (the sandbox stand-in for N vs 4N executors),
≥3 trials each in fresh JVMs, reports median wall-clock, throughput, and
scaling efficiency = (throughput@32 / throughput@8) / 4. Acceptance ≥ 0.8.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python BENCH/scaling.py [--rows 2000000] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRIAL_CODE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from txtlogparser_spark.sources.fixtures import build_vocab, default_workspace
from txtlogparser_spark.plans.pipeline import LogPipeline

cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
    .appName("scaling-trial")
    .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "16m")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.hadoop.parquet.block.size", str(32 * 1024 * 1024))
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

data = {data!r}
vocab = build_vocab()
info = spark.read.parquet(f"{{data}}/source_info.parquet")
pipe = LogPipeline(spark, default_workspace(), vocab, source_info=info)
seqs = pipe.load_sequences(f"{{data}}/sequences")

# warm the JVM + Python workers (excluded from timing, per protocol:
# wall-clock of the job excluding session startup)
pipe.run(seqs.limit(5000)).count()

times = []
for t in range({trials}):
    t0 = time.perf_counter()
    routed = pipe.run(seqs)
    n = routed.count()
    pipe.filter_counts(routed).collect()
    times.append(time.perf_counter() - t0)
print(json.dumps({{"cpus": cpus, "rows_in": {rows}, "rows_routed": n,
                   "times": times}}))
spark.stop()
"""


def run_config(cpus: int, data: str, rows: int, trials: int) -> dict:
    code = TRIAL_CODE.format(repo=REPO, cpus=cpus, data=data, rows=rows, trials=trials)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3000,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    os.environ.setdefault("BENCH_SEQ_ROWS", str(args.rows))
    import bench

    bench.SEQ_ROWS = args.rows
    data = bench.ensure_bench_sequences()

    results = {}
    for cpus in (8, 32):
        r = run_config(cpus, data, args.rows, args.trials)
        med = statistics.median(r["times"])
        results[cpus] = {
            **r,
            "median_sec": round(med, 2),
            "throughput": round(args.rows / med, 1),
        }

    eff = (results[32]["throughput"] / results[8]["throughput"]) / 4
    summary = {
        "metric": "scaling efficiency local[8] -> local[32]",
        "rows": args.rows,
        "trials": args.trials,
        "t8_median_sec": results[8]["median_sec"],
        "t32_median_sec": results[32]["median_sec"],
        "throughput8": results[8]["throughput"],
        "throughput32": results[32]["throughput"],
        "efficiency": round(eff, 3),
        "acceptance": eff >= 0.8,
        "rows_routed": results[32]["rows_routed"],
    }
    print(json.dumps(summary))

    md = f"""# BENCH/BASELINE — measured performance

## Scaling (north_rule: efficiency ≥ 0.8 from N to 4N)

Same job (parse→detokenize→route→aggregate over the {args.rows:,}-row
synthesized sequences table, hot source = 50% of rows), same input, fresh
JVM per config, {args.trials} trials each, timing excludes session
startup + worker warmup.

| config | median wall (s) | throughput (seq/s) |
|---|---|---|
| local[8]  (N)  | {results[8]['median_sec']} | {results[8]['throughput']:,} |
| local[32] (4N) | {results[32]['median_sec']} | {results[32]['throughput']:,} |

**Scaling efficiency = (throughput@32 / throughput@8) / 4 =
{summary['efficiency']}** — acceptance (≥ 0.8): {"PASS" if summary['acceptance'] else "FAIL"}.

Rows routed (survival set): {summary['rows_routed']:,} of {args.rows:,}.

Raw trial times (s): local[8] {results[8]['times']}, local[32] {results[32]['times']}.

## Notes

- Skew: the fixture forces ~50% of rows into one source; the span-UDF
  stage inherits the scan's balanced file splits (parquet row-group
  splits within the hot partition), so the hot source does not serialize
  — salting (`LogPipeline(salt_buckets=N)`) exists for wide stages that
  shuffle by source.
- The one Python stage (fused detokenize+span UDF) is Arrow-batched and
  embarrassingly parallel; everything else (prefilter, survival,
  broadcast enrich, CASE routing, partial+final aggregation) is JVM.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
