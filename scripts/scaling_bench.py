"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in the sandbox, so the same job runs at two
parallelism levels — local[8] and local[32] — on the SAME input (the
prescribed substitute: executor-count scaling becomes core-count
scaling; each run is a fresh JVM via subprocess so no warm-cache
bleed). Efficiency = (thr_4N / thr_N) / 4.

Usage: python scripts/scaling_bench.py [n_docs] [levels]
       defaults: 80000 docs, levels 8,32
Writes the result row to stdout; paste/refresh BENCH.md with it.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/pyjedai_scaling_corpus.parquet"


def build_corpus(n_docs: int) -> str:
    marker = os.path.join(CORPUS, f"_N{n_docs}")
    if os.path.exists(marker):
        return CORPUS
    import shutil

    shutil.rmtree(CORPUS, ignore_errors=True)
    from pyjedai_spark.session import get_spark
    from pyjedai_spark.synth import generate_webtext

    spark = get_spark("scaling-corpus", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    chunk = 100_000
    for i in range(0, n_docs, chunk):
        rows = []
        for j in range(i, min(i + chunk, n_docs), 5000):
            part, _ = generate_webtext(min(5000, n_docs - j), seed=100 + j)
            for r in part:
                r["eid"] += j
            rows.extend(part)
        df = spark.createDataFrame(
            [(r["eid"], r["url"], r["warc_ts"], bytearray(r["html"]),
              r["text"], r["lang"]) for r in rows],
            "eid long, url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )
        df.repartition(8).write.mode("append").parquet(CORPUS)
    spark.stop()
    open(marker, "w").close()
    return CORPUS


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000
    levels = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2
                               else "8,32").split(",")]
    corpus = build_corpus(n_docs)

    # r5: same host-health gate as bench.py — rounds 3-4 lost their
    # scaling measurement to hypervisor windows delivering ~2 of 32
    # cores (the serial leg barely notices; the wide leg starves and
    # the ratio collapses). Gate BEFORE each leg: a healthy pair needs
    # the whole run healthy, not just its start.
    from bench import _health_gate

    results = {}
    here = os.path.dirname(os.path.abspath(__file__))
    gates = {}
    calib_med = {}

    def _gate_calib(g):
        import statistics
        return statistics.median(g["attempts"][-1]["calib_mb_s"])

    # A pair is only a measurement of the ENGINE if the host can
    # actually grant the upper leg's cores: with the hypervisor
    # delivering ~14 effective cores, an 8->32 pair has a hard
    # ceiling of (14/8)/4 = 0.44 efficiency regardless of engine
    # quality (measured: 0.34 at calib drift 1.01). Probe first and
    # warn if hi exceeds the budget.
    probe = _health_gate()
    eff_cores = probe["attempts"][-1].get("effective_cores", 32)
    if max(levels) > eff_cores:
        print(json.dumps({
            "warning": "upper leg exceeds host effective-core budget",
            "levels": levels, "effective_cores": eff_cores,
            "efficiency_ceiling":
                round(eff_cores / max(levels), 3),
            "hint": "pick levels with hi <= effective_cores, "
                    "e.g. 2,8 or 4,16"}))

    ref_calib = None
    for cores in levels:
        # a scaling PAIR is only valid if both legs see the same
        # single-thread speed: the first 8->32 attempt this round had
        # leg calibs of ~1300 vs ~490 MB/s (host slowed 2.6x between
        # legs) and printed 0.623 — a host artifact, not engine
        # scaling. Retry a leg whose pre-leg calib departs >1.3x from
        # the first leg's, up to 3 times with a pause.
        for attempt in range(3):
            gates[cores] = _health_gate()
            c = _gate_calib(gates[cores])
            drift = 1.0 if ref_calib is None else max(c, ref_calib) / min(
                c, ref_calib)
            print(json.dumps({"gate_before_cores": cores, "calib_med": c,
                              "cross_leg_drift": round(drift, 2),
                              **gates[cores]}))
            if gates[cores]["healthy"] and drift <= 1.3:
                break
            if attempt < 2:  # no pointless pause after the final attempt
                import time as _t
                _t.sleep(45)
        if ref_calib is None:
            ref_calib = _gate_calib(gates[cores])
        calib_med[cores] = _gate_calib(gates[cores])
        out = subprocess.run(
            [sys.executable, os.path.join(here, "scaling_run.py"),
             corpus, str(cores)],
            capture_output=True, text=True, check=True)
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)
        print(line)
    lo, hi = min(levels), max(levels)
    eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) \
        / (hi / lo)
    drift = max(calib_med[lo], calib_med[hi]) \
        / max(1e-9, min(calib_med[lo], calib_med[hi]))
    print(json.dumps({"metric": "scaling_efficiency",
                      "from_cores": lo, "to_cores": hi,
                      "value": round(eff, 3),
                      "threshold": 0.8, "pass": eff >= 0.8,
                      "cross_leg_calib_drift": round(drift, 2),
                      "host_healthy_throughout":
                          all(g["healthy"] for g in gates.values())
                          and drift <= 1.3}))


if __name__ == "__main__":
    main()
