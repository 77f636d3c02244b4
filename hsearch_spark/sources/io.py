"""StageStore: checkpointed stage tables with lineage + metrics + resume.

North-rule requirement: "every stage checkpoints signature and edge
tables back to Iceberg with per-partition lineage and metrics so runs
resume mid-pipeline". The reference keeps everything in RAM and has no
checkpointing at all (SURVEY.md §4) — this module is new design.

In-sandbox there is no iceberg-spark-runtime jar, so the store writes
parquet directories with the identical schema plus a `_LINEAGE.json`
sidecar carrying what Iceberg snapshot metadata would carry:
run-config hash, stage name, row count, per-partition row counts, and
wall-clock. On a real cluster, swap `_write`/`_read` for
`df.writeTo(f"{catalog}.{stage}")` — call sites don't change.

Resume contract: a stage directory whose _LINEAGE.json matches the
current config hash is COMPLETE and is read back instead of recomputed;
a partial write (crash mid-stage) has no sidecar and is overwritten.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageStore:
    spark: SparkSession
    work_dir: str
    config_hash: str
    metrics: dict[str, dict] = field(default_factory=dict)

    def _path(self, stage: str) -> str:
        return os.path.join(self.work_dir, self.config_hash, stage)

    def _sidecar(self, stage: str) -> str:
        return os.path.join(self._path(stage), "_LINEAGE.json")

    def is_complete(self, stage: str) -> bool:
        p = self._sidecar(stage)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            meta = json.load(f)
        return meta.get("config_hash") == self.config_hash

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def write(self, stage: str, df: DataFrame) -> DataFrame:
        """Write + sidecar; returns the re-read DataFrame (lineage cut)."""
        path = self._path(stage)
        if os.path.exists(path):
            shutil.rmtree(path)
        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(path)
        elapsed = time.monotonic() - t0
        out = self.spark.read.parquet(path)
        # per-partition lineage: rows per written file (what Iceberg's
        # manifest would record per data file)
        per_file = (
            out.groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )
        meta = {
            "config_hash": self.config_hash,
            "stage": stage,
            "rows": int(sum(r["count"] for r in per_file)),
            "files": {os.path.basename(r["file"]): int(r["count"]) for r in per_file},
            "write_sec": round(elapsed, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(self._sidecar(stage), "w") as f:
            json.dump(meta, f, indent=1)
        self.metrics[stage] = meta
        return out

    def materialize(self, stage: str, build) -> DataFrame:
        """Resume-aware: read if complete, else build() → write."""
        if self.is_complete(stage):
            meta = json.load(open(self._sidecar(stage)))
            meta["resumed"] = True
            self.metrics[stage] = meta
            return self.read(stage)
        return self.write(stage, build())
