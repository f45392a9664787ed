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


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows,
        "source_id long, target_id long, s_minx double, s_miny double, "
        "s_maxx double, s_maxy double, t_minx double, t_miny double, "
        "t_maxx double, t_maxy double")


def test_envelope_de9im_matrices(spark):
    """Exact rectangle relate matrices, hand-checked against shapely
    semantics for each topology class."""
    from pyjedai_spark.operators.spatial import envelope_de9im

    rows = [
        # equal squares
        (1, 1, 0.0, 0.0, 2.0, 2.0, 0.0, 0.0, 2.0, 2.0),
        # s strictly contains t
        (2, 2, 0.0, 0.0, 4.0, 4.0, 1.0, 1.0, 2.0, 2.0),
        # corner touch
        (3, 3, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0),
        # shared full edge
        (4, 4, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 2.0, 1.0),
        # partial overlap
        (5, 5, 0.0, 0.0, 2.0, 2.0, 1.0, 1.0, 3.0, 3.0),
        # disjoint
        (6, 6, 0.0, 0.0, 1.0, 1.0, 5.0, 5.0, 6.0, 6.0),
        # t within s, sharing part of s's boundary
        (7, 7, 0.0, 0.0, 2.0, 2.0, 0.0, 0.0, 1.0, 1.0),
    ]
    got = {r["source_id"]: r["de9im"]
           for r in envelope_de9im(_pairs(spark, rows)).collect()}
    assert got[1] == "2FFF1FFF2"   # shapely equal-polygons matrix
    assert got[2] == "212FF1FF2"   # shapely contains-properly matrix
    assert got[3] == "FF2F01212"   # shapely corner-touch matrix
    assert got[4] == "FF2F11212"   # shapely edge-touch matrix
    assert got[5] == "212101212"   # shapely overlapping-squares matrix
    assert got[6] == "FF2FF1212"   # shapely disjoint matrix
    assert got[7] == "212F11FF2"   # contains with boundary contact


def test_de9im_relations_reference_patterns(spark):
    """The reference's verifyRelations pattern set (verification.py:70-84)
    over the exact matrices — including the preserved quirk that
    crosses_1 ('T*T******') fires on proper containment."""
    from pyjedai_spark.operators.spatial import (de9im_relations,
                                                 envelope_de9im)

    rows = [
        (1, 1, 0.0, 0.0, 2.0, 2.0, 0.0, 0.0, 2.0, 2.0),   # equal
        (2, 2, 0.0, 0.0, 4.0, 4.0, 1.0, 1.0, 2.0, 2.0),   # contains
        (3, 3, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0),   # corner touch
        (5, 5, 0.0, 0.0, 2.0, 2.0, 1.0, 1.0, 3.0, 3.0),   # overlap
        (6, 6, 0.0, 0.0, 1.0, 1.0, 5.0, 5.0, 6.0, 6.0),   # disjoint
    ]
    rel = {r["source_id"]: r for r in de9im_relations(
        envelope_de9im(_pairs(spark, rows))).collect()}
    eq = rel[1]
    assert (eq["equals"], eq["intersects"], eq["contains"], eq["within"],
            eq["covered_by"], eq["covers"], eq["touches"]) == (1, 1, 1, 1, 1, 1, 0)
    co = rel[2]
    assert (co["contains"], co["covers"], co["within"], co["intersects"]) \
        == (1, 1, 0, 1)
    # reference quirk: crosses_1 = 'T*T******' matches proper containment
    assert co["crosses"] == 1
    tc = rel[3]
    assert (tc["touches"], tc["intersects"], tc["overlaps"]) == (1, 1, 0)
    assert tc["detected_links"] == 2 and tc["related"] == 1
    ov = rel[5]
    assert (ov["overlaps"], ov["intersects"], ov["equals"]) == (1, 1, 0)
    dj = rel[6]
    assert dj["related"] == 0 and dj["detected_links"] == 0
    assert dj["intersects"] == 0


def test_de9im_relations_on_fake_hook_matrix(spark):
    """The pattern layer consumes ANY relate-matrix string — here a fake
    shapely-hook output (lowercase, line-crossing '0' case) proving the
    geometry_verify path classifies without shapely present."""
    from pyjedai_spark.operators.spatial import (de9im_relations,
                                                 related_geometries_stats)

    fake = spark.createDataFrame(
        [(1, 2, "0f1ff0102"), (3, 4, "ff2ff1212")],
        "source_id long, target_id long, de9im string")
    rel = {r["source_id"]: r for r in de9im_relations(fake).collect()}
    assert rel[1]["crosses"] == 1 and rel[1]["intersects"] == 1
    assert rel[3]["related"] == 0
    stats = related_geometries_stats(de9im_relations(fake)).collect()[0]
    assert stats["verified_pairs"] == 2
    assert stats["interlinked_geometries"] == 1
    assert stats["n_crosses"] == 1 and stats["n_equals"] == 0


def test_geometry_verify_schema_passthrough(spark):
    """geometry_verify must derive its output schema from the input
    (doubles stay doubles) — regression for the hardcoded-long schema."""
    from pyjedai_spark.operators.spatial import geometry_verify

    pairs = spark.createDataFrame(
        [(1, 0.5, "POINT (0 0)", "POINT (0 0)")],
        "id long, weight double, wkt1 string, wkt2 string")
    out = geometry_verify(pairs)
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint", "weight:double", "wkt1:string", "wkt2:string",
        "de9im:string"]
