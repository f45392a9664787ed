import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyjedai_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pyjedai-spark-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _reclaim_blocks(request):
    """Unpersist leftover localCheckpoint blocks after each test: the
    async ContextCleaner lags and a 190-test single-JVM session
    otherwise degrades steadily (same fix as bench.py / check_oracles).
    Only runs when the test actually touched the session-scoped spark
    fixture."""
    yield
    if "spark" not in request.fixturenames:
        return
    import gc

    gc.collect()
    s = request.getfixturevalue("spark")
    s.catalog.clearCache()
    it = s.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()._2().unpersist(True)


@pytest.fixture(scope="session")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ["documents", "embeddings", "lineitem", "orders", "customer",
              "events", "region", "nation", "supplier", "part"]:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def assert_df_matches_oracle(sdf, duck_con, sql, sort_cols=None, approx_cols=(),
                             tol=1e-9):
    """Compare a Spark DataFrame against a DuckDB result: same rows,
    order-insensitive, with optional float tolerance columns."""
    import pandas as pd

    s = sdf.toPandas()
    d = duck_con.execute(sql).df()
    assert sorted(s.columns) == sorted(d.columns), (
        f"schema mismatch: {sorted(s.columns)} vs {sorted(d.columns)}")
    cols = sorted(s.columns)
    s, d = s[cols], d[cols]
    sort_cols = sort_cols or cols
    s = s.sort_values(sort_cols).reset_index(drop=True)
    d = d.sort_values(sort_cols).reset_index(drop=True)
    assert len(s) == len(d), f"row count {len(s)} vs {len(d)}"
    for c in cols:
        if c in approx_cols:
            import numpy as np

            assert np.allclose(s[c].astype(float), d[c].astype(float),
                               atol=tol, rtol=0), f"col {c} differs"
        else:
            pd.testing.assert_series_equal(
                s[c], d[c], check_dtype=False, check_names=False,
                obj=f"col {c}")
