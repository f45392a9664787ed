"""Iceberg checkpoint integration run — execute on a machine with
Maven access (this sandbox is offline, so `tests/test_checkpoint.py`'s
Iceberg leg self-skips there; this script is the documented way to
exercise it for real).

    python scripts/iceberg_checkpoint_integration.py [warehouse_dir]

What it does:
  1. starts a SparkSession with `--packages`-equivalent config pulling
     the Iceberg Spark runtime jar (spark.jars.packages) and a local
     Hadoop-catalog warehouse;
  2. runs `CheckpointManager(fmt="iceberg")` through the same resume
     contract the parquet leg tests: stage write -> new manager ->
     fingerprint hit (no recompute) -> fingerprint miss (recompute);
  3. prints PASS/FAIL per check and exits non-zero on any failure.

Jar coordinates (match the Spark/Scala of the installed pyspark —
pyspark 4.1.x is Spark 4.1 on Scala 2.13):

    org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:1.11.0

For pyspark 3.5.x use `iceberg-spark-runtime-3.5_2.12:1.6.1`. See
https://iceberg.apache.org/releases/ for the current matrix.
"""

import sys

sys.path.insert(0, ".")

ICEBERG_PKG = "org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:1.11.0"


def main() -> int:
    import tempfile

    from pyspark.sql import SparkSession

    warehouse = (sys.argv[1] if len(sys.argv) > 1
                 else tempfile.mkdtemp(prefix="iceberg_wh_"))
    meta = tempfile.mkdtemp(prefix="iceberg_meta_")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-checkpoint-integration")
        .config("spark.jars.packages", ICEBERG_PKG)
        .config("spark.sql.catalog.local",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from pyjedai_spark.checkpoint import CheckpointManager

    failures = []

    def check(name, cond):
        print(f"{'PASS' if cond else 'FAIL'}  {name}")
        if not cond:
            failures.append(name)

    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
    root = "local.db.integ"

    calls = []

    def build():
        calls.append(1)
        return spark.range(100).withColumnRenamed("id", "eid")

    ck = CheckpointManager(root, fmt="iceberg", meta_dir=meta)
    out1 = ck.stage(spark, "blocking", build, input_fingerprint="fp1")
    check("first stage write computes", len(calls) == 1)
    check("stage output readable", out1.count() == 100)

    # fresh manager, same fingerprint -> resume from the Iceberg table
    ck2 = CheckpointManager(root, fmt="iceberg", meta_dir=meta)
    out2 = ck2.stage(spark, "blocking", build, input_fingerprint="fp1")
    check("resume skips recompute", len(calls) == 1)
    check("resumed rows identical",
          out2.orderBy("eid").collect() == out1.orderBy("eid").collect())

    # changed fingerprint -> recompute + atomic replace
    ck3 = CheckpointManager(root, fmt="iceberg", meta_dir=meta)
    ck3.stage(spark, "blocking", build, input_fingerprint="fp2")
    check("fingerprint miss recomputes", len(calls) == 2)

    # lineage sidecar present with per-partition signatures
    import glob
    import json

    side = glob.glob(f"{meta}/blocking._lineage.json")
    check("lineage sidecar written", bool(side))
    if side:
        rec = json.load(open(side[0]))
        check("lineage carries fingerprint",
              rec.get("input_fingerprint") == "fp2")
        check("lineage has per-partition signatures",
              bool(rec.get("partitions")))

    spark.stop()
    print(f"\n{'ALL PASS' if not failures else f'{len(failures)} FAILED'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
