"""Single scaling-run worker: MinHash-LSH dedup pipeline end-to-end at
one parallelism level. Prints ONE JSON line.

Usage: python scripts/scaling_run.py CORPUS_PARQUET CORES
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus, cores = sys.argv[1], int(sys.argv[2])

    from pyjedai_spark.session import get_spark

    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(cores * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from pyjedai_spark.operators import clustering as CL
    from pyjedai_spark.operators import dedup as DD

    docs = spark.read.parquet(corpus)
    n_docs = docs.count()  # warms the scan; excluded from the timed window

    stages = {}
    t0 = time.perf_counter()

    t = time.perf_counter()
    cands = DD.lsh_candidate_pairs(docs, k=32, bands=8, shingle_size=3,
                                   id_col="eid", max_bucket=2000)
    cands = cands.localCheckpoint()
    stages["lsh_candidates"] = round(time.perf_counter() - t, 1)

    t = time.perf_counter()
    verified = DD.jaccard_verify(cands, docs, 0.5, 3, "eid").localCheckpoint()
    stages["verify"] = round(time.perf_counter() - t, 1)

    t = time.perf_counter()
    clusters = CL.connected_components(
        verified.select("id1", "id2"), nodes=docs.select("eid"))
    n_clustered = clusters.where(
        F.col("cluster_id") != F.col("eid")).count()
    stages["clustering"] = round(time.perf_counter() - t, 1)

    wall = time.perf_counter() - t0

    print(json.dumps({
        "cores": cores,
        "docs": n_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "stages": stages,
        "non_singleton_members": n_clustered,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
