"""Two-parallelism scaling legs for the END-TO-END corpus cleaning
pipeline (url dedup -> exact dedup -> Gopher gate -> MinHash-LSH
near-dup + CC) — the same north-rule evidence protocol as
scaling_bench.py, applied to the full cleaning chain.

Usage:
  python scripts/scaling_clean.py worker CORPUS_PARQUET CORES
      one leg, fresh JVM, prints ONE JSON line
  python scripts/scaling_clean.py [n_docs] [levels]
      builds/reuses the shared corpus, runs each level in a fresh
      subprocess JVM serially, prints per-leg rows + efficiency
      (defaults: 300000 docs, levels 8,32)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(corpus: str, cores: int) -> None:
    from pyspark.sql import functions as F

    from pyjedai_spark.pipeline import corpus_clean_pipeline
    from pyjedai_spark.session import get_spark

    spark = get_spark(f"scaling-clean-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(cores * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")
    # the synthetic vocabulary contains no English stopwords, which
    # would fail every doc at the Gopher gate and starve the near-dup
    # stage of input; deterministically map its two most frequent
    # tokens to stopwords so all four stages process realistic volumes
    # (applied identically at both parallelism levels — the comparison
    # is unaffected)
    docs = spark.read.parquet(corpus).select(
        "eid",
        F.replace(F.replace(F.col("text"), F.lit("data"), F.lit("the")),
                  F.lit("web"), F.lit("for")).alias("text"),
        # the generator repeats its URL pool across corpus chunks, which
        # would let the (cheap, O(n)-aggregate) URL stage absorb 95% of
        # the corpus; suffix with eid so the EXPENSIVE stages (quality
        # gate, LSH near-dup) process the full volume — that is the
        # scaling being evidenced
        F.concat(F.col("url"), F.lit("?eid="),
                 F.col("eid").cast("string")).alias("url"))
    n_docs = docs.count()  # warm the scan; excluded from the timed window

    t0 = time.perf_counter()
    out = corpus_clean_pipeline(docs, id_col="eid", url_col="url",
                                max_bucket=2000)
    statuses = {r["status"]: r["n"] for r in
                out.groupBy("status").agg(F.count("*").alias("n")).collect()}
    wall = round(time.perf_counter() - t0, 1)
    print(json.dumps({"cores": cores, "docs": n_docs, "wall_sec": wall,
                      "docs_per_sec": round(n_docs / wall, 1),
                      "statuses": statuses}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2], int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    levels = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2
                               else "8,32").split(",")]
    from scaling_bench import build_corpus

    corpus = build_corpus(n_docs)
    results = []
    for lv in levels:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "worker",
             corpus, str(lv)],
            capture_output=True, text=True, check=True)
        row = json.loads(p.stdout.strip().splitlines()[-1])
        results.append(row)
        print(json.dumps(row), flush=True)
    if len(results) >= 2:
        a, b = results[0], results[-1]
        eff = (b["docs_per_sec"] / a["docs_per_sec"]) / (b["cores"] / a["cores"])
        print(json.dumps({"efficiency": round(eff, 3),
                          "from_cores": a["cores"], "to_cores": b["cores"]}))


if __name__ == "__main__":
    main()
