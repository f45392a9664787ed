"""Per-stage checkpointing with lineage metrics — the resume-from-
checkpoint requirement of the north rule.

Iceberg is the production target (atomic snapshot commits, partition
evolution); the sandbox has no Iceberg runtime jar, so checkpoints are
parquet directories plus a _lineage.json sidecar carrying stage name,
input fingerprint, row count, wall time and per-partition signature
(count + content hash), which is what `resumable from checkpoint with
per-partition lineage + metrics` needs. Swapping the writer to
``df.writeTo(table).createOrReplace()`` is a one-liner once an Iceberg
catalog is configured.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, root: str, enabled: bool = True):
        self.root = root
        self.enabled = enabled
        if enabled:
            os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _meta_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}._lineage.json")

    def has(self, stage: str) -> bool:
        return self.enabled and os.path.exists(self._meta_path(stage))

    def stage(self, spark, stage: str, build, input_fingerprint: str = "") -> DataFrame:
        """Return the checkpointed DataFrame for ``stage`` if present
        (resume path), else compute via ``build()``, persist, record
        lineage, and return the persisted copy (truncated lineage)."""
        if not self.enabled:
            # A stage boundary is STILL a materialization point even with
            # durable checkpoints off: downstream operators (edge
            # weighting, CNP) reference their input 3-4 times, and
            # without a barrier each reference re-inlines the entire
            # upstream lineage — plans grow multiplicatively (~2000
            # physical operators for purge->filter->CNP) and every
            # reference recomputes the chain. localCheckpoint keeps the
            # data executor-local with no durability cost.
            return build().localCheckpoint()
        path = self._dir(stage)
        if self.has(stage):
            meta = json.load(open(self._meta_path(stage)))
            if meta.get("input_fingerprint") == input_fingerprint:
                return spark.read.parquet(path)
        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        # per-partition lineage signature: spark_partition_id + row count
        # + order-insensitive content hash of the partition
        parts = (
            out.withColumn("_pid", F.spark_partition_id())
            .withColumn("_h", F.xxhash64(*[F.col(c) for c in out.columns]))
            .groupBy("_pid")
            .agg(F.count("*").alias("rows"),
                 # bit_xor: order-insensitive, overflow-free under ANSI
                 F.expr("bit_xor(_h)").alias("content_sig"))
            .collect()
        )
        meta = {
            "stage": stage,
            "input_fingerprint": input_fingerprint,
            "rows": int(out.count()),
            "wall_s": round(time.time() - t0, 3),
            "partitions": [
                {"pid": int(r["_pid"]), "rows": int(r["rows"]),
                 "content_sig": int(r["content_sig"])} for r in parts
            ],
            "ts": time.time(),
        }
        with open(self._meta_path(stage), "w") as f:
            json.dump(meta, f)
        return out
