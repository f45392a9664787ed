#!/usr/bin/env python
"""Diagnose the fresh-JVM first-run pathology (r4 verdict item 6).

Runs one query repeatedly in a single fresh JVM and samples, around
every execution, the JVM's own compiler + classloader counters:

- ``CompilationMXBean.getTotalCompilationTime()`` — cumulative ms the
  JIT compiler threads have spent (C1+C2);
- ``ClassLoadingMXBean.getTotalLoadedClassCount()`` — generated
  classes are loaded classes (each whole-stage-codegen unit compiles
  to one ``GeneratedClass``);
- executor-CPU per execution from a stage-metrics accumulator
  (sum of executorCpuTime across completed stages, via a
  SparkListener-free diff of the status tracker's stage data is not
  exposed to PySpark, so we use wall + the JVM counters).

Usage::

    python scripts/jit_probe.py [query] [sf_dir] [repeats]

Prints one JSON line per execution:
``{"i": n, "wall_s": w, "jit_ms_delta": c, "classes_delta": k}``.
A JIT-bound first run shows jit_ms_delta of the same order as wall
on executions 0-1 and near-zero afterwards, while classes_delta
collapses after run 0 (plan reuse) — distinguishing compile churn
from host noise (which moves wall but NOT jit_ms_delta).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    query = sys.argv[1] if len(sys.argv) > 1 else "der_dedup_clusters"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyjedai_spark.queries import QUERIES
    from pyjedai_spark.session import get_spark

    spark = get_spark(app_name=f"jit-probe-{query}")
    spark.sparkContext.setLogLevel("ERROR")
    mf = spark._jvm.java.lang.management.ManagementFactory
    comp = mf.getCompilationMXBean()
    cl = mf.getClassLoadingMXBean()

    import gc

    def _sweep():
        gc.collect()
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(True)

    fn = QUERIES[query]
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for i in range(repeats):
        jit0, cls0 = comp.getTotalCompilationTime(), cl.getTotalLoadedClassCount()
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        print(json.dumps({
            "i": i, "wall_s": round(wall, 2), "rows": rows,
            "jit_ms_delta": comp.getTotalCompilationTime() - jit0,
            "classes_delta": cl.getTotalLoadedClassCount() - cls0,
            "jit_ms_total": comp.getTotalCompilationTime(),
        }), flush=True)
        _sweep()
    spark.stop()


if __name__ == "__main__":
    main()
