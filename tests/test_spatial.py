"""Spatial ER: equigrid filtering, weighting quirks, top-K, relations."""

import pytest
from pyspark.sql import functions as F  # noqa: F401


def _env(spark, rows):
    return spark.createDataFrame(
        rows, "id long, minx double, miny double, maxx double, maxy double")


def test_equigrid_cf_and_boundary_quirk(spark):
    """Reference addToIndex uses range(floor(min/t), ceil(max/t)) —
    EXCLUSIVE ceil — so an envelope ending exactly on a cell boundary
    covers only up to that boundary, and a zero-extent axis aligned on
    a boundary covers NO cell (quirk replicated)."""
    from pyjedai_spark.operators.spatial import (equigrid_candidates,
                                                 source_thetas)

    # two unit squares -> thetas (1.0, 1.0)
    src = _env(spark, [(1, 0.0, 0.0, 1.0, 1.0), (2, 10.0, 10.0, 11.0, 11.0)])
    assert source_thetas(src) == (1.0, 1.0)
    tgt = _env(spark, [
        (101, 0.5, 0.5, 1.5, 1.5),    # overlaps source 1 (cells 0&1)
        (102, 1.0, 1.0, 2.0, 2.0),    # touches source 1 only at corner
        (103, 50.0, 50.0, 51.0, 51.0),  # far away
    ])
    out = {(r["source_id"], r["target_id"]): (r["common_cells"], r["weight"])
           for r in equigrid_candidates(src, tgt, "CF").collect()}
    assert out[(1, 101)] == (1, 1.0)   # shares cell (0,0)
    # 102's cells start at (1,1); source 1 covers only cell (0,0)
    # (exclusive ceil) -> no common cell -> NOT a candidate even though
    # envelopes touch
    assert (1, 102) not in out
    assert (2, 103) not in out


def test_equigrid_js_plus_one_quirk(spark):
    """getNoOfBlocks counts (max-min+1) per axis although indexing is
    exclusive: a unit square 'covers' 1 cell but counts 4 blocks."""
    from pyjedai_spark.operators.spatial import equigrid_candidates

    src = _env(spark, [(1, 0.0, 0.0, 1.0, 1.0)])
    tgt = _env(spark, [(101, 0.0, 0.0, 1.0, 1.0)])
    row = equigrid_candidates(src, tgt, "JS_APPROX").collect()[0]
    # cf=1, nb1=nb2=(1-0+1)*(1-0+1)=4 -> 1/(4+4-1)
    assert row["common_cells"] == 1
    assert row["weight"] == pytest.approx(1 / 7, abs=1e-6)


def test_mbr_weight_and_topk_order(spark):
    from pyjedai_spark.operators.spatial import spatial_topk

    src = _env(spark, [(1, 0.0, 0.0, 2.0, 2.0), (2, 0.0, 0.0, 2.0, 2.0)])
    tgt = _env(spark, [(101, 1.0, 1.0, 3.0, 3.0),   # IoU = 1/7
                       (102, 0.0, 0.0, 2.0, 2.0)])  # IoU = 1
    got = spatial_topk(src, tgt, budget=3, w_scheme="MBR").collect()
    assert [(r["source_id"], r["target_id"]) for r in got] == \
        [(2, 102), (1, 102), (2, 101)]  # weight desc, then ids desc
    assert got[0]["weight"] == 1.0
    assert got[2]["weight"] == pytest.approx(1 / 7, abs=1e-6)


def test_mega_geometry_cap(spark):
    from pyjedai_spark.operators.spatial import equigrid_candidates

    # nine unit squares + one continent: thetas ~ (100.9, 100.9), the
    # continent covers a 10x10 cell range (> cap), units cover 1 cell
    src = _env(spark, [(i, 0.0, 0.0, 1.0, 1.0) for i in range(1, 10)]
               + [(99, 0.0, 0.0, 1000.0, 1000.0)])
    tgt = _env(spark, [(101, 0.0, 0.0, 1.0, 1.0)])
    out = equigrid_candidates(src, tgt, "CF", max_cells_per_geom=10)
    ids = {r["source_id"] for r in out.collect()}
    assert ids == set(range(1, 10))  # continent capped out, not exploded
    uncapped = equigrid_candidates(src, tgt, "CF", max_cells_per_geom=None)
    assert {r["source_id"] for r in uncapped.collect()} == set(range(1, 10)) | {99}


def test_envelope_relations_and_geometry_hook_guard(spark):
    from pyjedai_spark.operators.spatial import (envelope_relations,
                                                 geometry_verify)

    pairs = spark.createDataFrame(
        [(1, 101, 0.0, 0.0, 4.0, 4.0, 1.0, 1.0, 2.0, 2.0)],
        "source_id long, target_id long, s_minx double, s_miny double, "
        "s_maxx double, s_maxy double, t_minx double, t_miny double, "
        "t_maxx double, t_maxy double")
    r = envelope_relations(pairs).collect()[0]
    assert (r["intersects"], r["contains"], r["within"], r["equals"]) \
        == (1, 1, 0, 0)

    try:
        import shapely  # noqa: F401
        pytest.skip("shapely installed; guard not testable")
    except ImportError:
        pass
    wp = spark.createDataFrame(
        [(1, "POINT (0 0)", "POINT (0 0)")], "id long, wkt1 string, wkt2 string")
    with pytest.raises(Exception, match="shapely"):
        geometry_verify(wp).collect()


def test_spatial_input_validation(spark):
    from pyjedai_spark.operators.spatial import equigrid_candidates

    good = _env(spark, [(1, 0.0, 0.0, 1.0, 1.0)])
    bad = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="missing"):
        equigrid_candidates(bad, good)
    with pytest.raises(ValueError, match="unknown spatial weighting"):
        equigrid_candidates(good, good, "COSINE")
    degenerate = _env(spark, [(1, 0.0, 0.0, 0.0, 5.0)])
    with pytest.raises(ValueError, match="degenerate"):
        equigrid_candidates(degenerate, good)
