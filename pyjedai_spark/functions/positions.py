"""Scalable global position / dense rank — the distributed replacement
for ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY.

An unpartitioned window funnels EVERY row through one task; fine at 5k
rows, serializes the job at web scale. The classic two-pass pattern
used here instead:

  1. ``repartitionByRange`` on the sort expressions — Spark's range
     partitioner samples boundaries so partition i holds a contiguous
     slice of the global order;
  2. per-partition ``row_number`` (window partitioned by the physical
     partition id — bounded input per task);
  3. per-partition row counts (one tiny row per partition) cumulated
     into offsets and broadcast back; global position = offset + local
     rank.

Three small jobs, no single-task stage whose input grows with the data.
Requires the sort key to be UNIQUE per row (ties may straddle range
boundaries; with a unique key the assignment is total and
deterministic). Rows holding the same key value are never split by the
range partitioner — pathological single-value skew would need a salt,
which a position index cannot use; callers' keys (block key + entity
id) are fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_position(df: DataFrame, order_cols, pos_col: str = "pos",
                         num_partitions: int | None = None) -> DataFrame:
    """Add ``pos_col``: 0-based dense global position of each row under
    the total order given by ``order_cols`` (list of column names or
    Column expressions, ``.desc()`` supported). The combination of
    order columns must uniquely identify a row.
    """
    order_cols = list(order_cols)
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(n, *order_cols).withColumn(
        "_gp_pid", F.spark_partition_id())
    wloc = Window.partitionBy("_gp_pid").orderBy(*order_cols)
    local = ranged.withColumn("_gp_lrn", F.row_number().over(wloc) - 1)
    # MATERIALIZE HERE, not at the end: `local` feeds two plan branches
    # (the per-partition counts and the output join). spark_partition_id
    # is nondeterministic to Catalyst, and when exchange reuse does not
    # kick in each branch would re-run repartitionByRange with FRESHLY
    # sampled boundaries — counts from one partitioning, ranks from
    # another, garbage positions. One checkpoint = one sampling.
    local = local.localCheckpoint(eager=True)
    counts = local.groupBy("_gp_pid").agg(F.count("*").alias("_gp_cnt"))
    # cumulative offsets: |partitions| rows — a driver-scale window
    woff = Window.orderBy("_gp_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_gp_pid",
        F.coalesce(F.sum("_gp_cnt").over(woff), F.lit(0)).alias("_gp_off"),
    )
    # downstream consumers (e.g. the +w self-join in sorted
    # neighborhood) re-derive this join per branch, but from the
    # checkpointed `local` blocks the result is deterministic — no
    # second materialization needed.
    return (
        local.join(F.broadcast(offsets), "_gp_pid")
        .withColumn(pos_col, F.col("_gp_off") + F.col("_gp_lrn"))
        .drop("_gp_pid", "_gp_lrn", "_gp_off")
    )
