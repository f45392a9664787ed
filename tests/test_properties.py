"""Property-based tests (hypothesis): randomized inputs, semantic
invariants — complements the example tests and the DuckDB oracle gate
with properties that must hold for EVERY input, not just the fixtures.

Each property batches its generated docs into one DataFrame so an
example costs one Spark job, and caps examples (Spark latency >>
hypothesis defaults).
"""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyjedai_spark.session import get_spark

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

# small vocab forces shared windows / repeated lines
_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps",
                         "zeta", "eta", "theta"])
_doc = st.lists(_word, min_size=0, max_size=60).map(" ".join)


def _tokens(text):
    return [t for t in re.split(r"[\W_]", text.lower()) if t]


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=2, max_size=8))
def test_duplicate_spans_are_real(texts):
    """Every reported span must be byte-identical token runs at the
    reported offsets in both docs, and maximal runs never overlap on
    the same diagonal."""
    from pyjedai_spark.operators import dedup as DD
    spark = get_spark()
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    toks = {i: _tokens(t) for i, t in enumerate(texts)}
    for r in DD.duplicate_spans(docs, w=5).collect():
        t1 = toks[r["id1"]][r["start1"]:r["start1"] + r["span_tokens"]]
        t2 = toks[r["id2"]][r["start2"]:r["start2"] + r["span_tokens"]]
        assert len(t1) == r["span_tokens"] >= 5
        assert t1 == t2, f"span text mismatch: {t1} vs {t2}"


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=1, max_size=10))
def test_repetition_fractions_bounded(texts):
    from pyjedai_spark.functions import analysis as A
    spark = get_spark()
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    for r in A.repetition_stats(docs).collect():
        for c in r.asDict():
            if c.endswith("frac"):
                assert 0.0 <= r[c] <= 1.0, f"{c}={r[c]}"


@settings(**_SETTINGS)
@given(st.lists(st.tuples(
    st.sampled_from(["http", "https", "HTTP", ""]),
    st.sampled_from(["Ex.COM", "a.b.ORG:443", "x.io:80", "y.z"]),
    st.sampled_from(["/P/q/", "/one", "", "/A//"]),
    st.sampled_from(["", "b=2&a=1", "utm_source=t&k=v", "fbclid=1"])),
    min_size=1, max_size=12))
def test_canonical_url_idempotent(parts):
    """canonical(canonical(u)) == canonical(u) for url-shaped inputs."""
    from pyjedai_spark.functions.urls import canonical_url
    spark = get_spark()
    urls = [((s + "://") if s else "") + h + p + (("?" + q) if q else "")
            for s, h, p, q in parts]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(canonical_url("url").alias("c1")) \
        .select("c1", canonical_url("c1").alias("c2")).collect()
    for r in out:
        assert r["c1"] == r["c2"], f"not idempotent: {r['c1']} -> {r['c2']}"


@settings(**_SETTINGS)
@given(st.lists(st.lists(_word, min_size=0, max_size=8)
                .map("\n".join), min_size=1, max_size=8),
       st.integers(min_value=2, max_value=3))
def test_line_dedup_conservation(texts, min_count):
    """Kept lines are a subset of the originals, counts are consistent,
    and after dedup no line occurs >= min_count times corpus-wide
    (keep_first retains exactly one occurrence of each hot line)."""
    from pyjedai_spark.functions import analysis as A
    spark = get_spark()
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    rows = A.line_dedup(docs, min_count=min_count).collect()
    all_kept = []
    for r in rows:
        orig = [ln.strip() for ln in texts[r["eid"]].split("\n")
                if ln.strip()]
        kept = [ln for ln in r["clean_text"].split("\n") if ln]
        assert r["n_lines"] == len(orig)
        assert r["n_kept"] == len(kept) <= r["n_lines"]
        # kept is a subsequence of orig (order preserved, no inventions)
        it = iter(orig)
        assert all(any(k == o for o in it) for k in kept)
        all_kept += kept
    from collections import Counter
    for line, cnt in Counter(all_kept).items():
        assert cnt < max(min_count, 2), f"{line!r} still x{cnt}"


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
                min_size=1, max_size=300, unique=True),
       st.integers(min_value=1, max_value=40))
def test_per_key_top_n_equals_naive(rows, n):
    """Histogram-split exact top-N == naive per-key window for random
    key distributions and quotas (incl. quota > key size, quota
    landing mid-bucket)."""
    from pyspark.sql import Window
    from pyjedai_spark.operators.sampling import per_key_top_n
    spark = get_spark()
    df = spark.createDataFrame(rows, "key long, id long") \
        .withColumn("_ord", F.md5(F.col("id").cast("string")))
    got = {(r["key"], r["id"])
           for r in per_key_top_n(df, "key", "_ord", n).collect()}
    w = Window.partitionBy("key").orderBy("_ord")
    want = {(r["key"], r["id"])
            for r in df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= n).collect()}
    assert got == want


_GOOD = ("the quick brown fox jumps over that lazy dog with good text "
         * 10).strip()
_GOOD2 = ("a different page of prose that still has the usual function "
          "words in it and is long enough to clear the gate " * 6).strip()


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(
    st.sampled_from([_GOOD, _GOOD2, "short junk"]),
    st.lists(_word, min_size=0, max_size=3),
    st.integers(0, 4)), min_size=1, max_size=8))
def test_corpus_clean_partitions_input(specs):
    """corpus_clean labels every input doc exactly once; survivors
    always point at a smaller-or-equal input id (kept -> itself,
    low_quality -> NULL)."""
    from pyjedai_spark.pipeline import corpus_clean_pipeline
    spark = get_spark()
    rows = [(i, base + (" " + " ".join(tail) if tail else ""),
             f"https://host{u}.com/p")
            for i, (base, tail, u) in enumerate(specs)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    out = corpus_clean_pipeline(docs, url_col="url").collect()
    ids = {r["eid"] for r in out}
    assert ids == set(range(len(rows))) and len(out) == len(rows)
    for r in out:
        if r["status"] == "kept":
            assert r["survivor"] == r["eid"]
        elif r["status"] == "low_quality":
            assert r["survivor"] is None
        else:
            assert r["survivor"] is not None and r["survivor"] < r["eid"]
            assert r["survivor"] in ids


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=2, max_size=10),
       st.floats(min_value=0.2, max_value=0.9))
def test_jaccard_verify_subset_of_exact(texts, threshold):
    """LSH-verified pairs are a subset of the exact n-gram Jaccard join
    at the same threshold, with identical jaccard values."""
    from pyjedai_spark.operators import dedup as DD
    spark = get_spark()
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    cands = DD.lsh_candidate_pairs(docs, k=16, bands=4, shingle_size=2,
                                   max_bucket=None)
    got = {(r["id1"], r["id2"]): r["jaccard"]
           for r in DD.jaccard_verify(cands, docs, threshold, 2).collect()}
    exact = {(r["id1"], r["id2"]): r["jaccard"]
             for r in DD.ngram_jaccard_pairs(docs, n=2,
                                             threshold=threshold).collect()}
    for pair, j in got.items():
        assert pair in exact, f"false positive {pair}"
        assert abs(exact[pair] - j) < 1e-6
        assert j >= threshold - 1e-9
