"""Checkpoint-resumable runs with per-partition lineage + metrics tables.

north_rule requirement. The reference's closest analog is
save-on-every-mutation persistence (WorkspaceManager.cpp:25-76); at
10^12-row scale a run must instead be resumable mid-flight:

- the input is processed in PARTITION BATCHES (groups of `source`
  partitions — the Iceberg partition-spec unit);
- each completed batch appends its sink output plus one lineage row
  (run_id, stage, partition_id, rows_in, rows_out, checksum, status,
  batch) — schema per FIXTURES.md §5;
- resume = anti-join: skip batches whose lineage row says 'done'
  (matching by batch key), then process the remainder. Batch outputs are
  written to per-batch subdirectories, so a re-run never double-writes a
  completed batch (poor-man's Iceberg snapshot commit: parquet
  subdir + lineage row appended only after the write succeeds).

Determinism: the pipeline is a pure function of (config, input batch) —
UDFs are deterministic, no timestamps/randomness in the data path — so an
interrupted-then-resumed run is row-identical to an uninterrupted one
(asserted in tests/test_lineage_resume.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = (
    "run_id string, stage string, partition_id int, rows_in long, "
    "rows_out long, checksum string, status string, updated_at timestamp, "
    "batch string"
)


@dataclass
class RunManifest:
    run_id: str
    config_digest: str
    input_path: str
    out_dir: str

    def save(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        with open(os.path.join(self.out_dir, f"manifest_{self.run_id}.json"), "w") as fh:
            json.dump(self.__dict__, fh, indent=2)


class CheckpointedRunner:
    """Run a DataFrame-producing stage per partition batch, with lineage."""

    def __init__(
        self,
        spark: SparkSession,
        run_id: str,
        out_dir: str,
        *,
        stage: str = "route",
    ) -> None:
        self.spark = spark
        self.run_id = run_id
        self.out_dir = out_dir
        self.stage = stage
        self.lineage_dir = os.path.join(out_dir, "lineage")
        self.metrics_dir = os.path.join(out_dir, "metrics")
        self.sink_dir = os.path.join(out_dir, "sink")
        os.makedirs(self.lineage_dir, exist_ok=True)

    # ---- lineage table ----
    def lineage(self) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_dir)
        except AnalysisException as e:
            # ONLY the no-lineage-yet case may read as empty; a corrupt
            # footer / permission / transient FS error must surface, or
            # a "resume" silently re-executes every completed batch and
            # appends duplicate done rows
            if "PATH_NOT_FOUND" in str(e) or "unable to infer schema" in str(e).lower():
                return self.spark.createDataFrame([], LINEAGE_SCHEMA)
            raise

    def completed_batches(self) -> set:
        rows = (
            self.lineage()
            .where((F.col("run_id") == self.run_id) & (F.col("status") == "done"))
            .select("batch")
            .distinct()
            .collect()
        )
        return {r["batch"] for r in rows}

    def _append_lineage(self, batch: str, partition_id: int, rows_in: int,
                        rows_out: int, checksum: str, status: str) -> None:
        df = self.spark.createDataFrame(
            [
                (
                    self.run_id, self.stage, partition_id, rows_in, rows_out,
                    checksum, status, None, batch,
                )
            ],
            LINEAGE_SCHEMA,
        ).withColumn("updated_at", F.current_timestamp())
        df.coalesce(1).write.mode("append").parquet(self.lineage_dir)

    # ---- run ----
    def run(
        self,
        sources: Sequence[str],
        build: Callable[[List[str]], DataFrame],
        *,
        batch_size: int = 4,
        fail_after: Optional[int] = None,
    ) -> int:
        """Process `sources` in batches of `batch_size`; `build(batch)`
        returns the routed DataFrame for those sources. `fail_after` is a
        test hook: raise after N completed batches (simulated crash).

        Returns the number of batches executed in this invocation.
        """
        batches = [
            sorted(sources)[i : i + batch_size]
            for i in range(0, len(sources), batch_size)
        ]
        keys = [",".join(b) for b in batches]
        # batch output dirs are CONTENT-keyed (md5 of the source list),
        # matching the lineage resume key. Positional numbering plus a
        # changed batch_size/source list between invocations used to
        # leave stale batch dirs behind that sink() would read as
        # duplicate rows. Cleanup policy (round-3 ADVICE, medium):
        #   keep  — this invocation's key set (live), and any batch
        #           recorded 'done' by ANY run whose source set is
        #           DISJOINT from this invocation's sources (an
        #           incremental invocation over newly arrived sources
        #           must not destroy prior completed batches);
        #   drop  — dirs never recorded done (aborted writes), and done
        #           dirs that OVERLAP this invocation's sources but use
        #           a different decomposition (a re-batch: keeping both
        #           would double-count the shared sources in sink()).
        # A dropped overlapping dir's non-current sources leave the sink
        # until a later invocation re-includes them; resuming an OLD
        # run_id after a newer overlapping invocation is unsupported.
        import hashlib
        import shutil

        def _dir_name(k: str) -> str:
            return f"batch={hashlib.md5(k.encode()).hexdigest()[:12]}"

        dir_for = {k: os.path.join(self.sink_dir, _dir_name(k)) for k in keys}
        if os.path.isdir(self.sink_dir):
            cur_sources = set(sources)
            done_any_run = {
                r["batch"]
                for r in self.lineage()
                .where(F.col("status") == "done")
                .select("batch")
                .distinct()
                .collect()
            }
            keep = {_dir_name(k) for k in keys} | {
                _dir_name(k)
                for k in done_any_run
                if not (set(k.split(",")) & cur_sources)
            }
            for name in os.listdir(self.sink_dir):
                if name.startswith("batch=") and name not in keep:
                    shutil.rmtree(os.path.join(self.sink_dir, name))
        done = self.completed_batches()
        executed = 0
        for pid, batch in enumerate(batches):
            key = keys[pid]
            if key in done:
                continue
            if fail_after is not None and executed >= fail_after:
                raise RuntimeError(f"injected failure after {executed} batches")
            df = build(list(batch))
            out = dir_for[key]
            df.write.mode("overwrite").parquet(out)
            written = self.spark.read.parquet(out)
            rows_out = written.count()
            # order-insensitive, overflow-free content checksum over doc_id
            checksum = str(
                written.agg(F.expr("bit_xor(xxhash64(doc_id))")).collect()[0][0]
            )
            self._append_lineage(key, pid, -1, rows_out, checksum, "done")
            executed += 1
        return executed

    def sink(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.sink_dir, "batch=*"))

    def write_metrics(self, metrics: DataFrame) -> None:
        """Append-only metrics rows stamped with (run_id, stage); readers
        dedup by taking the latest run_id — no key columns are enforced
        here (an earlier signature took an unused key_cols)."""
        (
            metrics.withColumn("run_id", F.lit(self.run_id))
            .withColumn("stage", F.lit(self.stage))
            .coalesce(1)
            .write.mode("append")
            .parquet(self.metrics_dir)
        )


def new_run_id() -> str:
    return time.strftime("run_%Y%m%d_%H%M%S")
