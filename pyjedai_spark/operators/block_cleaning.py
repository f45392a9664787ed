"""Block cleaning: BlockPurging + BlockFiltering.

Both reduce the comparison space *before* any pair explosion — at web
scale these (plus size caps) are what keep Zipfian mega-blocks from
producing quadratic shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def java_math_round(x: float) -> int:
    """int(x + 0.5) — Java half-up rounding (reference utils.py:204-205).
    NOT python round() (banker's) and NOT Spark round (half-even)."""
    return int(math.floor(x + 0.5))


def block_cardinalities(postings: DataFrame, dirty: bool = True) -> DataFrame:
    """(key, block_size, cardinality). DER cardinality = s(s-1)/2;
    CCER (postings carry ``side``) cardinality = n1*n2
    (datamodel.py:496-506, both branches)."""
    if not dirty:
        return postings.groupBy("key").agg(
            F.count("*").alias("block_size"),
            (F.sum((F.col("side") == 1).cast("long"))
             * F.sum((F.col("side") == 2).cast("long"))).alias("cardinality"),
        )
    return postings.groupBy("key").agg(F.count("*").alias("block_size")).withColumn(
        "cardinality",
        (F.col("block_size") * (F.col("block_size") - 1) / 2).cast("long"),
    )


def purging_threshold(levels: list[tuple[int, float, float]],
                      smoothing_factor: float = 1.025) -> float:
    """Scalar threshold scan of BlockPurging._set_threshold
    (block_cleaning.py:158-198), run driver-side on the tiny per-level
    aggregate (#distinct cardinality levels rows).

    ``levels``: ascending (cardinality, cum_block_assignments,
    cum_comparisons) — the reference's block_assignments /
    total_comparisons_per_level arrays after its cumulative scan.
    """
    if len(levels) <= 1:
        return 0.0
    cur_bc = cur_cc = cur_size = prev_bc = prev_cc = prev_size = 0.0
    for i in range(len(levels) - 1, 0, -1):
        prev_size, prev_bc, prev_cc = cur_size, cur_bc, cur_cc
        cur_size, cur_bc, cur_cc = (
            float(levels[i][0]), float(levels[i][1]), float(levels[i][2]))
        if cur_bc * prev_cc < smoothing_factor * cur_cc * prev_bc:
            break
    return prev_size


def _scan_threshold(cards: DataFrame, smoothing_factor: float) -> float:
    """Level-table collect + driver-side scan over an existing
    cardinality frame (the O(#levels) piece of BlockPurging)."""
    levels = (
        cards.groupBy("cardinality")
        .agg(F.sum("block_size").alias("bs"), F.sum("cardinality").alias("cc"))
        .withColumn(
            "cum_bs",
            F.sum("bs").over(
                Window.orderBy("cardinality").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "cum_cc",
            F.sum("cc").over(
                Window.orderBy("cardinality").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .orderBy("cardinality")
        .select("cardinality", "cum_bs", "cum_cc")
        .collect()
    )
    return purging_threshold([(r[0], r[1], r[2]) for r in levels],
                             smoothing_factor)


def block_purging(postings: DataFrame, smoothing_factor: float = 1.025,
                  dirty: bool = True) -> DataFrame:
    """Drop blocks whose cardinality exceeds the scanned threshold
    (BlockPurging, block_cleaning.py:110-207).

    Plan: groupBy(key) -> groupBy(cardinality) level agg -> cumulative
    window over the (tiny) level table -> collect scalar -> filter. The
    only driver-side piece is the O(#levels) threshold scan.
    """
    cards = block_cardinalities(postings, dirty)
    thr = _scan_threshold(cards, smoothing_factor)
    keep = cards.where(F.col("cardinality") <= F.lit(thr)).select("key")
    # broadcast the kept-key whitelist when it is small; Catalyst/AQE will
    # decide — we only express the semi-join.
    return postings.join(keep, "key", "left_semi")


def block_filtering(postings: DataFrame, ratio: float = 0.8,
                    dirty: bool = True) -> DataFrame:
    """Retain each entity only in the java_round(ratio*|blocks(e)|)
    smallest-cardinality blocks it occurs in, then re-drop singleton
    blocks (BlockFiltering, block_cleaning.py:33-108, core 82-97).

    Determinism delta (documented, SURVEY §4.4): the reference breaks
    cardinality ties by dict insertion order (OrderedSet,
    block_cleaning.py:209-210); we use (cardinality, key) — an explicit
    total order that both the Spark plan and any SQL oracle share.
    """
    cards = block_cardinalities(postings, dirty).select("key", "cardinality")
    return _filter_with_cards(postings.join(cards, "key"), ratio, dirty)


def _filter_with_cards(p: DataFrame, ratio: float, dirty: bool,
                       keep_size: bool = False) -> DataFrame:
    """BlockFiltering core over postings that already carry their
    block's ``cardinality`` column (shared by :func:`block_filtering`
    and the fused :func:`clean_blocks`). ``keep_size`` retains the
    REBUILT block size as ``bs`` (dirty path only)."""
    w = Window.partitionBy("eid").orderBy(F.col("cardinality").asc(), F.col("key").asc())
    ranked = (
        p.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy("eid")))
    )
    # java_math_round(ratio*n) == floor(ratio*n + 0.5)
    kept = ranked.where(
        F.col("_rn") <= F.floor(F.lit(ratio) * F.col("_n") + F.lit(0.5))
    )
    if not dirty:
        # CCER validity after the rebuild: a block survives only if BOTH
        # datasets still contribute (drop_single_entity_blocks CCER branch)
        kept = kept.select("key", "eid", "side")
        kw = Window.partitionBy("key")
        kept = (
            kept.withColumn("_n1", F.sum((F.col("side") == 1).cast("int")).over(kw))
            .withColumn("_n2", F.sum((F.col("side") == 2).cast("int")).over(kw))
            .where((F.col("_n1") >= 1) & (F.col("_n2") >= 1))
            .select("key", "eid", "side")
        )
        return kept
    kept = kept.select("key", "eid")
    # rebuilt blocks may now be singletons -> drop (block_cleaning.py:97)
    from .block_building import keep_multi_entity_blocks

    return keep_multi_entity_blocks(kept, 2, keep_size=keep_size)


def clean_blocks(postings: DataFrame, smoothing_factor: float = 1.025,
                 ratio: float = 0.8, dirty: bool = True,
                 materialize: bool = True, keep_size: bool = False) -> DataFrame:
    """BlockPurging + BlockFiltering fused: output-identical to
    ``block_filtering(block_purging(p, s), r)``, but the tokenized
    postings materialize ONCE and the block-cardinality aggregate runs
    ONCE (purging drops whole blocks, so a surviving block's cardinality
    is unchanged — the original cardinality frame serves the threshold
    scan, the purge filter, AND the filtering ranks).

    The naive composition computes block cardinalities three times
    (threshold collect, the purge semi-join's build side, filtering) and
    tokenizes the corpus twice (threshold collect + the downstream
    materialization) — at 100 TB that is two full extra passes over the
    corpus. Pass ``materialize=False`` when ``postings`` is already a
    checkpoint/materialized stage boundary.
    """
    if materialize:
        postings = postings.localCheckpoint()
    # one groupBy over materialized postings, materialized because it
    # feeds both the level collect and the purge+filter join below
    cards = block_cardinalities(postings, dirty).localCheckpoint()
    thr = _scan_threshold(cards, smoothing_factor)
    kept_cards = cards.where(F.col("cardinality") <= F.lit(thr)).select(
        "key", "cardinality")
    # inner join = purge semi-join + cardinality attach in one exchange
    return _filter_with_cards(postings.join(kept_cards, "key"), ratio, dirty,
                              keep_size=keep_size)
