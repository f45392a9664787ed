"""Schema matching (Valentine re-expression): name- and instance-based
column correspondences."""

from pyspark.sql import functions as F  # noqa: F401

import pytest


def test_name_based_ranks_shared_suffix_first(spark):
    from pyjedai_spark.schema_matching import name_based_matches

    t1 = spark.createDataFrame([(1, "a", "x")],
                               "cust_key long, cust_name string, other string")
    t2 = spark.createDataFrame([(1, "b")], "supp_key long, supp_name string")
    out = name_based_matches(t1, t2).collect()
    by_pair = {(r["col1"], r["col2"]): r["score"] for r in out}
    assert len(by_pair) == 6  # full 3 x 2 ranking matrix
    assert by_pair[("cust_name", "supp_name")] > by_pair[("other", "supp_name")]
    assert by_pair[("cust_key", "supp_key")] > by_pair[("other", "supp_key")]


def test_jaccard_leven_instance_overlap(spark):
    from pyjedai_spark.schema_matching import jaccard_leven_matches

    t1 = spark.createDataFrame(
        [("alpha", "red"), ("beta", "blue"), ("gamma", "green"),
         ("delta", "red")],
        "word string, color string")
    t2 = spark.createDataFrame(
        [("alpha",), ("betas",), ("omega",), ("kappa",)], "term string")
    out = {(r["col1"], r["col2"]): r["score"]
           for r in jaccard_leven_matches(t1, t2, threshold_leven=0.8).collect()}
    # word vs term: alpha==alpha exact; beta~betas (lev 1, max 5 -> 0.8)
    # -> inter=2, n1=4, n2=4 -> 2/6
    assert out[("word", "term")] == pytest.approx(2 / 6, abs=1e-6)
    # color vs term: no fuzzy matches at 0.8
    assert out[("color", "term")] == 0.0


def test_jaccard_leven_band_join_equals_cross_join(spark):
    """The length-band expansion must find EXACTLY the pairs a cross
    join finds — the optimization is invisible in the output."""
    from pyjedai_spark.schema_matching import jaccard_leven_matches

    vals1 = ["a", "ab", "abc", "abcd", "abcde", "xylophone", "xylophones",
             "", "zz", "qqqq"]
    vals2 = ["abc", "abcd", "xylophone", "zzz", "q", "abcdefgh"]
    t1 = spark.createDataFrame([(v,) for v in vals1], "u string")
    t2 = spark.createDataFrame([(v,) for v in vals2], "v string")
    got = jaccard_leven_matches(t1, t2, threshold_leven=0.7).collect()[0]

    import itertools
    def sim(a, b):
        import numpy as np  # noqa: F401
        # plain python levenshtein
        la, lb = len(a), len(b)
        if max(la, lb) == 0:
            return 1.0
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return 1.0 - d[lb] / max(la, lb)
    inter = sum(1 for u in set(vals1) if u and any(
        round(sim(u, v), 6) >= 0.7 for v in set(vals2)))
    n1 = len([v for v in set(vals1) if v is not None])
    n2 = len(set(vals2))
    assert got["score"] == pytest.approx(inter / (n1 + n2 - inter), abs=1e-6)


def test_schema_matching_dispatch(spark):
    from pyjedai_spark.schema_matching import schema_matching

    t1 = spark.createDataFrame([("a",)], "x string")
    t2 = spark.createDataFrame([("a",)], "y string")
    assert schema_matching(t1, t2, "name").count() == 1
    assert schema_matching(t1, t2, "jaccard_leven").count() == 1
    with pytest.raises(NotImplementedError, match="Valentine"):
        schema_matching(t1, t2, "coma")
    with pytest.raises(ValueError, match="unknown schema matching"):
        schema_matching(t1, t2, "nope")
