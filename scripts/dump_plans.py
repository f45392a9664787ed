"""Dump .explain('formatted') for a set of registry queries to files.

Usage: python scripts/dump_plans.py OUT_DIR SUFFIX [query ...]
       (no queries -> the bench headline set + extras)

Runs from whatever repo root is first on sys.path — invoke with cwd set
to the tree whose plans you want (the round's before/after trees).
"""

import os
import sys

sys.path.insert(0, os.getcwd())

OUT, SUFFIX = sys.argv[1], sys.argv[2]
names = sys.argv[3:]

from pyjedai_spark.session import get_spark  # noqa: E402

spark = get_spark("plan-dump")
spark.sparkContext.setLogLevel("ERROR")

from pyjedai_spark.queries import QUERIES  # noqa: E402
import bench  # noqa: E402

if not names:
    names = bench.HEADLINE + bench.EXTRA

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.makedirs(OUT, exist_ok=True)
for name in names:
    fn = bench.EXTRA_QUERIES.get(name) or QUERIES[name]
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"{name}: {plan.count('Exchange')} Exchange, "
          f"{plan.count('BatchEvalPython')} BatchEvalPython, "
          f"{plan.count('ArrowEvalPython')} ArrowEvalPython -> {path}")
spark.stop()
