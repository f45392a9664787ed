"""Corpus sampling / quota operators for a crawl pipeline.

The core primitive is ``per_key_top_n`` — EXACT smallest-N rows per key
WITHOUT a per-key window sort. The naive
``row_number() OVER (PARTITION BY key ORDER BY ord)`` funnels every row
of a key through one task; a boilerplate-heavy domain with 10^9 pages
is a guaranteed straggler at crawl scale. Here the order column is
bucketed into a fixed-width histogram first:

1. count rows per (key, bucket) — map-side-combining aggregate;
2. per key, a cumulative scan over at most 4096 rows (the
   window partition is bounded by the HISTOGRAM width, never by data
   size) finds the threshold bucket where the N-th row falls;
3. rows in buckets strictly below the threshold pass wholesale; only
   the rows INSIDE the single threshold bucket (≈ rows_of_key /
   4096 of them for a hash-uniform order column) are exactly
   ranked to fill the remainder.

Output is bit-identical to the naive window (same total order), proven
by sharing the plain ``row_number`` DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def per_key_top_n(df: DataFrame, key_col: str, ord_col: str,
                  n: int) -> DataFrame:
    """Exact N smallest rows per key by (ord_col asc) — ties must be
    impossible in ``ord_col`` (use a unique tiebreak suffix); the
    prefix-histogram split keeps every window partition ≤
    max(#distinct prefixes, threshold-bucket population)."""
    ord_type = dict(df.dtypes).get(ord_col)
    if ord_type != "string":
        raise ValueError(
            f"per_key_top_n requires a string ord column (prefix bucketing "
            f"orders strings lexicographically); {ord_col!r} is {ord_type}. "
            f"Cast numerics to a fixed-width sortable form first (e.g. "
            f"lpad/format_string), or order by md5(id) as source_quota_sample "
            f"does.")
    o = F.col(ord_col)
    # bucket by the raw 3-char STRING prefix of the order value: for any
    # two strings, prefix(a) < prefix(b) implies a < b, and equal
    # prefixes land in the same bucket — so bucket order == value order
    # for ARBITRARY string ord columns (no fixed-length/lowercase-hex
    # assumption; an earlier hex-decode bucketing silently mis-ranked
    # non-hex orders). For hash-hex orders (md5) this yields 4096
    # uniform buckets; a pathological ord distribution that shares one
    # prefix degrades gracefully to the naive per-key window (still
    # exact, just unsplit).
    d = df.withColumn("_b", F.substring(o, 1, 3))
    hist = d.groupBy(key_col, "_b").agg(F.count("*").alias("_c"))
    wk = Window.partitionBy(key_col).orderBy("_b")  # ≤ 4096 rows/key
    # cum fans out into thr + below_info: materialize the (small,
    # ≤ keys×4096-row) histogram once or the full-corpus aggregate
    # re-runs per consumer — .explain showed it 3× unmaterialized
    cum = hist.withColumn("_cum", F.sum("_c").over(wk)).localCheckpoint()
    # threshold bucket: first with cumulative >= n
    thr = (cum.where(F.col("_cum") >= n)
           .groupBy(key_col).agg(F.min("_b").alias("_tb")))
    # rows below threshold bucket (or keys that never reach n) pass
    below_info = (cum.join(thr, key_col, "left")
                  .withColumn("_prev", F.col("_cum") - F.col("_c")))
    passed = (d.join(thr, key_col, "left")
              .where(F.col("_tb").isNull() | (F.col("_b") < F.col("_tb"))))
    # inside the threshold bucket: exact rank, fill the remainder
    prev_cnt = (below_info
                .where(F.col("_b") == F.col("_tb"))
                .select(key_col, "_tb", "_prev"))
    win_in = Window.partitionBy(key_col).orderBy(o)  # ONLY threshold-bucket rows
    inside = (d.join(prev_cnt, key_col)
              .where(F.col("_b") == F.col("_tb"))
              .withColumn("_rn", F.row_number().over(win_in))
              .where(F.col("_rn") + F.col("_prev") <= n))
    out_cols = df.columns
    return passed.select(*out_cols).unionByName(inside.select(*out_cols))


def source_quota_sample(docs: DataFrame, quota: int,
                        id_col: str = "doc_id",
                        source_col: str = "source") -> DataFrame:
    """Keep at most ``quota`` docs per source (domain), selected
    deterministically by md5(doc_id) — the standard per-domain cap of a
    crawl pipeline, exact and reproducible. Returns the surviving rows
    of ``docs`` (all columns)."""
    keyed = docs.withColumn("_ord", F.md5(F.col(id_col).cast("string")))
    out = per_key_top_n(keyed, source_col, "_ord", quota)
    return out.drop("_ord")
