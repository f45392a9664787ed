"""Spatial ER: equigrid filtering + MBR/grid weighting + top-K init.

The reference's spatial pipeline (src/pyjedai/spatial/filtering.py:33-87,
initialization.py:32-115, verification.py) builds a driver-side
defaultdict equigrid over shapely geometries and walks targets one by
one through a PriorityQueue. Spark-first, the same semantics over an
ENVELOPE table (id, minx, miny, maxx, maxy):

- thetas: mean source-envelope extents (filtering.py:setThetas) — one
  scalar aggregate;
- grid assignment: every geometry explodes to its covered cells with
  the reference's EXACT indexing quirks — python ``range(minX, maxX)``
  EXCLUDES the ceil bound (addToIndex, filtering.py:76-83), so a
  boundary-aligned envelope contributes no cell on that axis, while
  ``getNoOfBlocks`` counts ``(maxX-minX+1)*(maxY-minY+1)`` WITH +1
  (initialization.py:106-111) — both replicated bit-for-bit;
- candidates: cell equi-join source x target + per-pair co-occurring
  cell count (the reference's flag/freq counters become ONE groupBy),
  then the envelope-intersection validity test (validCandidate);
- weights (getWeight, initialization.py:91-105): CF = #common cells,
  JS_APPROX = cf/(nb1+nb2-cf), MBR = envelope overlap area / union
  area;
- top-K: the reference's budget PQ keeps the ``budget`` largest
  (weight, source_id, target_id) tuples — a global TakeOrdered, never
  a full sort materialization.

True-geometry DE-9IM verification needs a geometry library; the
envelope algebra above is exact arithmetic (oracle-checked in DuckDB),
and :func:`geometry_verify` is the shapely hook — an Arrow-batched
``mapInPandas`` over WKT, import-guarded like the media codecs
(shapely is absent in this sandbox; the plumbing is tested with the
envelope fallback).

At scale: the cell join shuffles on (cx, cy); a continent-sized
geometry exploding to millions of cells is the mega-block analogue —
``max_cells_per_geom`` caps it (drop-and-log, mirroring size-capped
block purging).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_LOG = logging.getLogger(__name__)

ENV_COLS = ("minx", "miny", "maxx", "maxy")


def _check_env(df: DataFrame, who: str) -> None:
    missing = [c for c in ("id", *ENV_COLS) if c not in df.columns]
    if missing:
        raise ValueError(f"{who} needs columns (id, minx, miny, maxx, maxy); "
                         f"missing {missing}")


def source_thetas(source: DataFrame) -> tuple[float, float]:
    """Mean envelope extents of the SOURCE set (setThetas,
    filtering.py:51-66). Scalar aggregate -> driver floats."""
    row = source.agg(
        F.avg(F.col("maxx") - F.col("minx")).alias("tx"),
        F.avg(F.col("maxy") - F.col("miny")).alias("ty")).first()
    tx, ty = row["tx"], row["ty"]
    if not tx or not ty or tx <= 0 or ty <= 0:
        raise ValueError("degenerate source extents; cannot build equigrid")
    return float(tx), float(ty)


def _cells(df: DataFrame, tx: float, ty: float,
           max_cells_per_geom: int | None) -> DataFrame:
    """(id, cx, cy) — covered grid cells, range-EXCLUSIVE upper bound
    exactly like the reference's ``range(minX, maxX)``."""
    lox = F.floor(F.col("minx") / tx).cast("long")
    hix = (F.ceil(F.col("maxx") / tx) - 1).cast("long")
    loy = F.floor(F.col("miny") / ty).cast("long")
    hiy = (F.ceil(F.col("maxy") / ty) - 1).cast("long")
    ncells = (hix - lox + 1) * (hiy - loy + 1)
    out = df.select(
        "id",
        F.when(hix >= lox, F.sequence(lox, hix))
        .otherwise(F.array().cast("array<long>")).alias("_xs"),
        F.when(hiy >= loy, F.sequence(loy, hiy))
        .otherwise(F.array().cast("array<long>")).alias("_ys"),
        ncells.alias("_nc"),
    )
    if max_cells_per_geom is not None:
        # drop-AND-log: a silently filtered continent-sized geometry is
        # invisible coverage loss — count the casualties (one narrow
        # scan of the envelope table, cheap next to the cell explode)
        dropped = out.where(F.col("_nc") > max_cells_per_geom).count()
        if dropped:
            _LOG.warning(
                "equigrid: dropped %d geometries exceeding "
                "max_cells_per_geom=%d", dropped, max_cells_per_geom)
        out = out.where(F.col("_nc") <= max_cells_per_geom)
    return out.select(
        "id", F.explode("_xs").alias("cx"), "_ys"
    ).select("id", "cx", F.explode("_ys").alias("cy"))


def _n_blocks(pref: str, tx: float, ty: float):
    """getNoOfBlocks (initialization.py:106-111) — WITH the +1 quirk."""
    return (
        (F.ceil(F.col(f"{pref}maxx") / tx) - F.floor(F.col(f"{pref}minx") / tx) + 1)
        * (F.ceil(F.col(f"{pref}maxy") / ty) - F.floor(F.col(f"{pref}miny") / ty) + 1)
    ).cast("double")


def equigrid_candidates(source: DataFrame, target: DataFrame,
                        w_scheme: str = "CF",
                        max_cells_per_geom: int | None = 100_000,
                        round_to: int = 6,
                        require_intersection: bool = True,
                        keep_envelopes: bool = False) -> DataFrame:
    """(source_id, target_id, common_cells, weight): pairs co-occurring
    in >= 1 equigrid cell whose envelopes truly intersect, weighted per
    ``w_scheme`` in {CF, JS_APPROX, MBR}.

    ``require_intersection=False`` skips the validCandidate envelope
    test (cells are coarse, so co-occurring pairs can be disjoint) —
    the DE-9IM classification layer wants those too.
    ``keep_envelopes=True`` appends the s_*/t_* envelope columns for
    downstream :func:`envelope_de9im`."""
    _check_env(source, "source")
    _check_env(target, "target")
    scheme = w_scheme.upper()
    if scheme not in ("CF", "JS_APPROX", "MBR"):
        raise ValueError(f"unknown spatial weighting scheme {w_scheme!r}")
    tx, ty = source_thetas(source)

    cs = _cells(source, tx, ty, max_cells_per_geom) \
        .withColumnRenamed("id", "source_id")
    ct = _cells(target, tx, ty, max_cells_per_geom) \
        .withColumnRenamed("id", "target_id")
    # near-unique (pair, cell) groups: same no-partial-agg shape as
    # edge_weights
    common = (cs.join(ct, ["cx", "cy"])
              .repartition("source_id", "target_id")
              .groupBy("source_id", "target_id")
              .agg(F.count("*").alias("common_cells")))

    se = source.select(F.col("id").alias("source_id"),
                       *[F.col(c).alias(f"s_{c}") for c in ENV_COLS])
    te = target.select(F.col("id").alias("target_id"),
                       *[F.col(c).alias(f"t_{c}") for c in ENV_COLS])
    j = common.join(se, "source_id").join(te, "target_id")
    # validCandidate (initialization.py:88-89): envelope intersection,
    # boundary contact included (shapely intersects semantics)
    if require_intersection:
        valid = ((F.col("s_minx") <= F.col("t_maxx"))
                 & (F.col("t_minx") <= F.col("s_maxx"))
                 & (F.col("s_miny") <= F.col("t_maxy"))
                 & (F.col("t_miny") <= F.col("s_maxy")))
        j = j.where(valid)

    cf = F.col("common_cells").cast("double")
    if scheme == "CF":
        w = cf
    elif scheme == "JS_APPROX":
        w = cf / (_n_blocks("s_", tx, ty) + _n_blocks("t_", tx, ty) - cf)
    else:  # MBR
        ix = F.greatest(F.lit(0.0),
                        F.least("s_maxx", "t_maxx") - F.greatest("s_minx", "t_minx"))
        iy = F.greatest(F.lit(0.0),
                        F.least("s_maxy", "t_maxy") - F.greatest("s_miny", "t_miny"))
        inter = ix * iy
        a1 = (F.col("s_maxx") - F.col("s_minx")) * (F.col("s_maxy") - F.col("s_miny"))
        a2 = (F.col("t_maxx") - F.col("t_minx")) * (F.col("t_maxy") - F.col("t_miny"))
        den = a1 + a2 - inter
        w = F.when(den != 0, inter / den).otherwise(F.lit(0.0))

    env_cols = ([f"s_{c}" for c in ENV_COLS] + [f"t_{c}" for c in ENV_COLS]
                if keep_envelopes else [])
    return j.select("source_id", "target_id",
                    F.col("common_cells").cast("long").alias("common_cells"),
                    F.round(w, round_to).alias("weight"), *env_cols)


def spatial_topk(source: DataFrame, target: DataFrame, budget: int,
                 w_scheme: str = "CF", **kw) -> DataFrame:
    """StandardSpatialInitialization's budget PQ: the global ``budget``
    largest (weight, source_id, target_id) tuples, TakeOrdered (per-
    partition top-K + driver merge, no global sort)."""
    c = equigrid_candidates(source, target, w_scheme, **kw)
    return (c.orderBy(F.col("weight").desc(), F.col("source_id").desc(),
                      F.col("target_id").desc())
            .limit(budget)
            .select("source_id", "target_id", "weight"))


def envelope_relations(pairs: DataFrame) -> DataFrame:
    """Envelope-algebra relations for candidate pairs carrying both
    envelopes (s_minx.. / t_minx..): intersects / contains / within /
    equals as exact column expressions — the verification fallback when
    no geometry library is present (true DE-9IM needs the shapely hook
    below)."""
    inter = ((F.col("s_minx") <= F.col("t_maxx"))
             & (F.col("t_minx") <= F.col("s_maxx"))
             & (F.col("s_miny") <= F.col("t_maxy"))
             & (F.col("t_miny") <= F.col("s_maxy")))
    contains = ((F.col("s_minx") <= F.col("t_minx"))
                & (F.col("s_maxx") >= F.col("t_maxx"))
                & (F.col("s_miny") <= F.col("t_miny"))
                & (F.col("s_maxy") >= F.col("t_maxy")))
    within = ((F.col("t_minx") <= F.col("s_minx"))
              & (F.col("t_maxx") >= F.col("s_maxx"))
              & (F.col("t_miny") <= F.col("s_miny"))
              & (F.col("t_maxy") >= F.col("s_maxy")))
    return pairs.withColumns({
        "intersects": inter.cast("int"),
        "contains": contains.cast("int"),
        "within": within.cast("int"),
        "equals": (contains & within).cast("int"),
    })


def geometry_verify(pairs: DataFrame, wkt1: str = "wkt1",
                    wkt2: str = "wkt2") -> DataFrame:
    """True-geometry DE-9IM verification (ref spatial/verification.py
    computes shapely ``relate`` matrices): Arrow-batched mapInPandas
    over WKT columns, shapely loaded once per worker — import-guarded;
    this sandbox has no shapely, so the hook raises with guidance and
    tests pin the wiring via :func:`envelope_relations` instead."""
    def _verify(batches):
        try:
            from shapely import wkt as _wkt
        except ImportError as ex:
            raise ImportError(
                "geometry_verify needs shapely on every executor "
                "(pip install shapely); envelope_relations is the "
                "dependency-free fallback") from ex
        for pdf in batches:
            g1 = pdf[wkt1].map(_wkt.loads)
            g2 = pdf[wkt2].map(_wkt.loads)
            pdf = pdf.copy()
            pdf["de9im"] = [a.relate(b) for a, b in zip(g1, g2)]
            yield pdf

    schema = StructType(
        list(pairs.schema.fields) + [StructField("de9im", StringType())])
    return pairs.mapInPandas(_verify, schema)


# ---------------------------------------------------------------------------
# DE-9IM pattern layer (ref spatial/verification.py:7-87): the reference
# matches 9-char patterns against shapely ``relate`` matrices with three
# matcher kinds — Pattern (all cells match), AntiPattern (negation),
# NOrPattern (any of a list). Re-expressed as pure column expressions
# over the de9im string, so the layer runs identically on the shapely
# hook's output and on :func:`envelope_de9im`'s exact rectangle algebra.
# ---------------------------------------------------------------------------

def de9im_pattern(matrix, pattern: str):
    """Column predicate: does the 9-char DE-9IM ``matrix`` column match
    ``pattern``? Cell semantics exactly as ref verification.py DIMS:
    'F'→{F}, 'T'→{0,1,2}, '*'→any, digit→itself (ref Pattern.matches)."""
    m = F.upper(matrix) if isinstance(matrix, F.Column) else F.upper(F.col(matrix))
    cond = F.lit(True)
    for i, p in enumerate(pattern.upper()):
        if p == "*":
            continue
        ch = F.substring(m, i + 1, 1)
        if p == "T":
            cond = cond & ch.isin("0", "1", "2")
        else:  # 'F' or a literal dimension digit
            cond = cond & (ch == p)
    return cond


def de9im_any(matrix, patterns) -> "F.Column":
    """NOrPattern (ref verification.py:51-67): match if ANY pattern
    matches."""
    out = F.lit(False)
    for p in patterns:
        out = out | de9im_pattern(matrix, p)
    return out


# the reference's named relations, verbatim (verification.py:70-84):
# crosses = crosses_lines | crosses_1 | crosses_2 (the reference checks
# all three regardless of geometry dims — quirk preserved); overlaps =
# overlaps1 | overlaps2; intersects is the ANTI-pattern of disjoint.
DE9IM_RELATIONS = {
    "contains": ["T*****FF*"],
    "covered_by": ["T*F**F***", "*TF**F***", "**FT*F***", "**F*TF***"],
    "covers": ["T*****FF*", "*T****FF*", "***T**FF*", "****T*FF*"],
    "crosses": ["0********", "T*T******", "T*****T**"],
    "equals": ["T*F**FFF*"],
    "overlaps": ["T*T***T**", "1*T***T**"],
    "touches": ["FT*******", "F**T*****", "F***T****"],
    "within": ["T*F**F***"],
}
_DISJOINT = "FF*FF****"


def de9im_relations(pairs: DataFrame, matrix_col: str = "de9im") -> DataFrame:
    """Classify every pair's DE-9IM matrix into the reference's named
    relations (verifyRelations, ref verification.py:183-231): one int
    flag column per relation, plus ``intersects`` (anti-pattern of
    disjoint), ``related`` (any relation held) and ``detected_links``
    (how many held — the reference increments detectedLinks once per
    matching relation)."""
    flags = {"intersects": (~de9im_pattern(pairs[matrix_col], _DISJOINT))}
    for name, pats in DE9IM_RELATIONS.items():
        flags[name] = de9im_any(pairs[matrix_col], pats)
    out = pairs.withColumns({k: v.cast("int") for k, v in flags.items()})
    link_sum = None
    for k in ("intersects", *DE9IM_RELATIONS):
        term = F.col(k)
        link_sum = term if link_sum is None else link_sum + term
    return out.withColumn("detected_links", link_sum) \
        .withColumn("related", (F.col("detected_links") > 0).cast("int"))


def related_geometries_stats(classified: DataFrame) -> DataFrame:
    """RelatedGeometries' counters (ref verification.py:88-181) as ONE
    aggregate row over :func:`de9im_relations` output: verified pairs,
    detected links, interlinked (related) pairs, and the per-relation
    getNoOf* counts."""
    aggs = [F.count("*").alias("verified_pairs"),
            F.sum("detected_links").cast("long").alias("detected_links"),
            F.sum("related").cast("long").alias("interlinked_geometries")]
    for k in ("contains", "covered_by", "covers", "crosses", "equals",
              "intersects", "overlaps", "touches", "within"):
        aggs.append(F.sum(k).cast("long").alias(f"n_{k}"))
    return classified.agg(*aggs)


def envelope_de9im(pairs: DataFrame, out_col: str = "de9im") -> DataFrame:
    """EXACT DE-9IM matrix for axis-aligned rectangle pairs, as pure
    column algebra over (s_minx..s_maxy, t_minx..t_maxy) — the
    dependency-free twin of the shapely hook: on envelope geometries the
    two produce identical matrices. PRECONDITION: non-degenerate
    rectangles (maxx > minx and maxy > miny on both sides); degenerate
    (line/point) envelopes have different boundary topology and must go
    through :func:`geometry_verify`.

    Derivation per cell (I=interior, B=boundary, E=exterior; dims over
    closed boxes A=s, B=t):
      II: 2 iff the OPEN boxes overlap;  IB/BI: 1 iff an edge of one box
      passes through the other's interior;  IE: 2 iff A ⊄ B (EI sym.);
      BB: 1 on collinear edge overlap of positive length, else 0 on any
      boundary contact (edge crossing / corner touch), else F;
      BE: 1 iff A ⊄ B (EB sym.);  EE: 2 always.
    """
    s0x, s1x = F.col("s_minx"), F.col("s_maxx")
    s0y, s1y = F.col("s_miny"), F.col("s_maxy")
    t0x, t1x = F.col("t_minx"), F.col("t_maxx")
    t0y, t1y = F.col("t_miny"), F.col("t_maxy")

    open_x = F.greatest(s0x, t0x) < F.least(s1x, t1x)
    open_y = F.greatest(s0y, t0y) < F.least(s1y, t1y)
    ii = F.when(open_x & open_y, F.lit("2")).otherwise(F.lit("F"))

    def _edge_in_interior(a0x, a1x, a0y, a1y, b0x, b1x, b0y, b1y):
        # does box B's boundary enter box A's OPEN interior?
        vert = ((a0x < b0x) & (b0x < a1x) | (a0x < b1x) & (b1x < a1x)) \
            & (F.greatest(a0y, b0y) < F.least(a1y, b1y))
        horiz = ((a0y < b0y) & (b0y < a1y) | (a0y < b1y) & (b1y < a1y)) \
            & (F.greatest(a0x, b0x) < F.least(a1x, b1x))
        return vert | horiz

    ib = F.when(_edge_in_interior(s0x, s1x, s0y, s1y, t0x, t1x, t0y, t1y),
                F.lit("1")).otherwise(F.lit("F"))
    bi = F.when(_edge_in_interior(t0x, t1x, t0y, t1y, s0x, s1x, s0y, s1y),
                F.lit("1")).otherwise(F.lit("F"))

    s_in_t = (t0x <= s0x) & (s1x <= t1x) & (t0y <= s0y) & (s1y <= t1y)
    t_in_s = (s0x <= t0x) & (t1x <= s1x) & (s0y <= t0y) & (t1y <= s1y)
    ie = F.when(s_in_t, F.lit("F")).otherwise(F.lit("2"))
    be = F.when(s_in_t, F.lit("F")).otherwise(F.lit("1"))
    ei = F.when(t_in_s, F.lit("F")).otherwise(F.lit("2"))
    eb = F.when(t_in_s, F.lit("F")).otherwise(F.lit("1"))

    x_vals_touch = (s0x == t0x) | (s0x == t1x) | (s1x == t0x) | (s1x == t1x)
    y_vals_touch = (s0y == t0y) | (s0y == t1y) | (s1y == t0y) | (s1y == t1y)
    bb1 = (x_vals_touch & (F.greatest(s0y, t0y) < F.least(s1y, t1y))) \
        | (y_vals_touch & (F.greatest(s0x, t0x) < F.least(s1x, t1x)))
    # point contact: a vertical edge of one box meets a horizontal edge
    # of the other (covers corner touches and zero-length collinearity)
    def _cross(a0x, a1x, a0y, a1y, b0x, b1x, b0y, b1y):
        # vertical edge of B (x∈{b0x,b1x}) × horizontal edge of A
        return (((a0x <= b0x) & (b0x <= a1x) | (a0x <= b1x) & (b1x <= a1x))
                & ((b0y <= a0y) & (a0y <= b1y) | (b0y <= a1y) & (a1y <= b1y)))

    bb0 = _cross(s0x, s1x, s0y, s1y, t0x, t1x, t0y, t1y) \
        | _cross(t0x, t1x, t0y, t1y, s0x, s1x, s0y, s1y)
    bb = F.when(bb1, F.lit("1")).when(bb0, F.lit("0")).otherwise(F.lit("F"))

    matrix = F.concat(ii, ib, ie, bi, bb, be, ei, eb, F.lit("2"))
    return pairs.withColumn(out_col, matrix)
