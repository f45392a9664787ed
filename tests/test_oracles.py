"""The local replica of the driver's correctness gate: every query in
the registry vs its DuckDB oracle (row count + schema + values)."""

import pytest

from pyjedai_spark.queries import ORACLES, QUERIES

from conftest import SF_DIR, assert_df_matches_oracle

FLOAT_COLS = {"weight", "sim", "jaccard", "cosine", "lang_score",
              "avg_token_len", "stopword_ratio", "unique_ratio",
              "alpha_ratio", "quality_score", "avg_block_size",
              "prec", "recall", "f1",
              "median_block_size", "stddev_block_size", "entropy"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        # rows-only contract for non-SQL-expressible ops
        assert sdf.count() >= 0
        return
    assert_df_matches_oracle(sdf, duck, ORACLES[name],
                             approx_cols=FLOAT_COLS, tol=1e-9)
