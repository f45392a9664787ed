#!/usr/bin/env python
"""Targeted per-query timing harness for optimization work — reuses the
frozen bench.py fresh-JVM worker protocol (adaptive warm-ups + repeats,
env-tunable) for an arbitrary subset of queries, so individual operator
changes can be measured without a full bench run. Results are cited in
OPTIMIZATION_r06.md; the driver's artifact remains bench.py's.

Usage: python bench_extra.py query [query ...]
Env: SPARK_GRAFT_SF_DIR, BENCH_REPEATS, BENCH_WARMUPS[_MAX] as bench.py.
"""

import json
import statistics
import sys

import bench


def main() -> None:
    names = sys.argv[1:]
    out = {}
    for name in names:
        rec = bench._run_worker(name)
        out[name] = {
            "median": round(statistics.median(rec["runs"]), 3),
            "min": round(min(rec["runs"]), 3),
            "runs": rec["runs"],
            "warmup": rec.get("warmup_sec"),
            "rows": rec.get("rows"),
            "calib_mb_s": rec.get("calib_mb_s"),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["median"] for k, v in out.items()}}))


if __name__ == "__main__":
    main()
