"""Run every (query, oracle) pair and report row-count/schema/value
mismatches — a local replica of the driver's correctness gate.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from pyjedai_spark.queries import ORACLES, QUERIES  # noqa: E402
from pyjedai_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df):
    """Canonical cell rendering that is TYPE-SENSITIVE, mirroring the
    driver's exact-value hash: an int64 11695 and a float 11695.0 must
    NOT compare equal (the driver hashes them differently)."""
    cols = sorted(df.columns)
    df = df[cols]
    out = pd.DataFrame(index=df.index)
    for c in cols:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.map(lambda v: "NULL" if pd.isna(v) else repr(float(v)))
        elif s.dtype.kind in "iu":
            out[c] = s.map(lambda v: f"i:{int(v)}")
        elif s.dtype.kind == "b":
            out[c] = s.map(lambda v: f"b:{bool(v)}")
        else:
            # object columns may still hold python ints/floats (duckdb
            # HUGEINT arrives as object) — keep them type-tagged too
            def r(v):
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    return "NULL"
                if isinstance(v, bool):
                    return f"b:{v}"
                if isinstance(v, float):
                    return repr(v)
                if isinstance(v, int):
                    return f"i:{v}"
                return str(v)
            out[c] = s.map(r)
    return out.sort_values(cols).reset_index(drop=True)


def compare(name, sdf, con, sql):
    s = sdf.toPandas()
    d = con.execute(sql).df()
    if sorted(s.columns) != sorted(d.columns):
        return f"SCHEMA {sorted(s.columns)} vs {sorted(d.columns)}"
    if len(s) != len(d):
        return f"ROWS {len(s)} vs {len(d)}"
    s, d = _canon(s), _canon(d)
    for c in s.columns:
        try:
            if not s[c].equals(d[c]):
                neq = s[c] != d[c]
                i = neq.idxmax()
                return f"VALUES col {c} row {i}: {s[c][i]} vs {d[c][i]}"
        except Exception as ex:
            return f"CMPERR col {c}: {ex}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"create view {t} as select * from "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass
    ok = bad = 0
    for name, qfn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qfn(spark, sf_dir)
            if name in ORACLES:
                err = compare(name, sdf, con, ORACLES[name])
                status = err or f"OK ({sdf.count()} rows)"
            else:
                n = sdf.count()
                status = f"ROWS-ONLY OK ({n} rows)"
                err = None
        except Exception as ex:
            err = f"EXC {type(ex).__name__}: {str(ex)[:300]}"
            status = err
        dt = time.time() - t0
        print(f"{name:28s} {dt:6.1f}s  {status}")
        if err:
            bad += 1
        else:
            ok += 1
        # reclaim localCheckpoint blocks the async ContextCleaner lags
        # on — without this, a 100+-query session degrades steadily
        import gc

        gc.collect()
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(True)
    print(f"\n{ok} ok, {bad} bad")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
