"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (the reference's best Dirty-ER dedup
  chain, workflow.py:718-735, re-expressed Spark-first) on sf0.001.
- ``queries()``: one entry per implemented operator (SURVEY.md §2);
  each callable (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: DuckDB-runnable ANSI SQL equivalent per query
  (omitted only for the pandas-UDF webtext path and the sequential
  greedy clusterer — driver records rows-only checks for those).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end near-duplicate clustering on sf0.001."""
    from pyjedai_spark.queries import QUERIES

    return QUERIES["der_dedup_clusters"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyjedai_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pyjedai_spark.queries import ORACLES

    return dict(ORACLES)
