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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
                        round_to: int = 6) -> DataFrame:
    """(source_id, target_id, common_cells, weight): pairs co-occurring
    in >= 1 equigrid cell whose envelopes truly intersect, weighted per
    ``w_scheme`` in {CF, JS_APPROX, MBR}."""
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

    return j.select("source_id", "target_id",
                    F.col("common_cells").cast("long").alias("common_cells"),
                    F.round(w, round_to).alias("weight"))


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
    import pandas as pd

    cols = pairs.columns

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

    schema = ", ".join(f"{c} string" if c in (wkt1, wkt2) else f"{c} long"
                       for c in cols) + ", de9im string"
    return pairs.mapInPandas(_verify, schema)
