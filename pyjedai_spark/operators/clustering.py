"""Clustering: similarity graph -> equivalence classes.

ConnectedComponentsClustering (reference src/pyjedai/clustering.py:431-475
— NetworkX on the driver) becomes an iterative min-label edge
contraction (hash-min in the style of Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14): each round every node of
the contracted graph adopts the minimum label of its closed
neighborhood and the edge list is relabeled/deduped — the graph
collapses toward one representative per component in O(log n) rounds,
each round a bounded number of shuffles on a monotonically shrinking
edge set. Lineage is truncated per round with localCheckpoint (SURVEY
§4 item 3: no Catalyst support for fixpoints).

Sequential greedy clusterers (UniqueMapping / Center / MergeCenter /
BestMatch, clustering.py:477-791) are inherently order-dependent scans of
a desc-sorted edge list; post-matching graphs are small (they are the
OUTPUT of aggressive pruning), so they run driver-side on a collected
edge list with an explicit size guard — same strategy the reference
uses implicitly by being single-process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DRIVER_EDGE_LIMIT = 5_000_000


def _bidir(edges: DataFrame) -> DataFrame:
    return edges.select(F.col("id1").alias("u"), F.col("id2").alias("v")).union(
        edges.select(F.col("id2").alias("u"), F.col("id1").alias("v"))
    )


def connected_components(edges: DataFrame, nodes: DataFrame | None = None,
                         max_iter: int = 50) -> DataFrame:
    """(eid, cluster_id=min reachable id) via large-star/small-star.

    large-star: every node connects its larger neighbors to the min of
    its closed neighborhood; small-star: every node connects its smaller
    neighbors (and itself) to that min. Alternating until fixpoint yields
    stars rooted at component minima.

    ``nodes`` (one column ``eid``) adds singleton clusters for isolated
    entities.
    """
    e = (
        edges.select(
            F.least("id1", "id2").alias("u"), F.greatest("id1", "id2").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    graph_nodes = (
        e.select(F.col("u").alias("eid")).union(e.select(F.col("v").alias("eid")))
        .distinct()
    )
    assign = graph_nodes.withColumn("label", F.col("eid")).localCheckpoint()

    for _ in range(max_iter):
        if e.isEmpty():
            break
        # min label over the CLOSED neighborhood of the contracted graph
        closed = _bidir(e.select(F.col("u").alias("id1"), F.col("v").alias("id2"))).union(
            e.select(F.col("u"), F.col("u").alias("v")).union(
                e.select(F.col("v").alias("u"), F.col("v"))
            ).distinct()
        )
        lab = closed.groupBy("u").agg(F.min("v").alias("m"))
        # pointer-jump once (lab := lab∘lab): shortcuts label chains so
        # long paths contract in O(log diameter) rounds, not O(diameter)
        lab = (
            lab.alias("a")
            .join(lab.select(F.col("u").alias("_m"), F.col("m").alias("_mm")),
                  F.col("a.m") == F.col("_m"), "left")
            .select(F.col("a.u").alias("u"),
                    F.least(F.coalesce("_mm", "a.m"), F.col("a.m")).alias("m"))
        )
        # contract: relabel edge endpoints by their new minimum
        e_new = (
            e.join(lab.withColumnRenamed("u", "_x").withColumnRenamed("m", "mu"),
                   F.col("u") == F.col("_x")).drop("_x")
            .join(lab.withColumnRenamed("u", "_y").withColumnRenamed("m", "mv"),
                  F.col("v") == F.col("_y")).drop("_y")
            .select(F.least("mu", "mv").alias("u"), F.greatest("mu", "mv").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # compose assignment with this round's relabeling
        assign = (
            assign.join(lab.withColumnRenamed("u", "label"), "label", "left")
            .select("eid", F.coalesce("m", "label").alias("label"))
            .localCheckpoint()
        )
        e = e_new

    out = assign.select("eid", F.col("label").alias("cluster_id"))
    if nodes is not None:
        singles = nodes.select(F.col(nodes.columns[0]).alias("eid")).join(
            out.select("eid"), "eid", "left_anti"
        ).withColumn("cluster_id", F.col("eid"))
        out = out.union(singles)
    return out


def connected_components_clustering(edges: DataFrame,
                                    nodes: DataFrame | None = None,
                                    similarity_threshold: float | None = None,
                                    dirty: bool = True) -> DataFrame:
    """CCC (clustering.py:431-475): drop edges with weight <
    threshold, components; CCER keeps only 2-element clusters
    (lines 466-467), DER keeps all."""
    e = edges
    if similarity_threshold is not None:
        wcol = "weight" if "weight" in e.columns else "sim"
        e = e.where(F.col(wcol) >= similarity_threshold)
    cc = connected_components(e.select("id1", "id2"), nodes)
    if not dirty:
        sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("n"))
        cc = cc.join(sizes.where(F.col("n") == 2).select("cluster_id"), "cluster_id")
    return cc


def _collect_edges(edges: DataFrame, weight_col: str):
    n = edges.count()
    if n > DRIVER_EDGE_LIMIT:
        raise ValueError(
            f"greedy clusterer input too large ({n} edges); tighten pruning "
            "or raise DRIVER_EDGE_LIMIT"
        )
    return edges.select("id1", "id2", weight_col).collect()


def unique_mapping_clustering(edges: DataFrame, similarity_threshold: float = 0.1,
                              weight_col: str = "sim") -> DataFrame:
    """UMC (clustering.py:477-539): desc-weight greedy 1-1 matching of
    edges with w > threshold; ties broken like the reference PQ tuple
    (1-w, id1, id2). Returns matched pairs (id1, id2, weight).

    Driver-side scan (sequential by construction); input is the pruned
    match graph. CCER-only in the reference — exposed generically here.
    """
    spark = edges.sparkSession
    rows = _collect_edges(edges.where(F.col(weight_col) > similarity_threshold),
                          weight_col)
    rows.sort(key=lambda r: (1 - r[2], r[0], r[1]))
    matched: set = set()
    out = []
    for id1, id2, w in rows:
        if id1 in matched or id2 in matched:
            continue
        matched.add(id1)
        matched.add(id2)
        out.append((id1, id2, float(w)))
    return spark.createDataFrame(out, "id1 long, id2 long, weight double")


def center_clustering(edges: DataFrame, similarity_threshold: float = 0.5,
                      weight_col: str = "sim", merge: bool = False) -> DataFrame:
    """CenterClustering (clustering.py:568-639) / MergeCenterClustering
    (730-791): desc-weight scan assigns center/member roles; normalized
    by weight-sum in the non-merge variant. Returns (eid, cluster_id).
    """
    spark = edges.sparkSession
    e = edges.where(F.col(weight_col) > similarity_threshold)
    if not merge:
        bw = e.select(F.col("id1").alias("u"), F.col(weight_col).alias("w")).union(
            e.select(F.col("id2").alias("u"), F.col(weight_col).alias("w"))
        )
        sums = bw.groupBy("u").agg(F.sum("w").alias("wsum"))
        rows = (
            e.join(sums.withColumnRenamed("u", "id1").withColumnRenamed("wsum", "s1"),
                   "id1")
            .join(sums.withColumnRenamed("u", "id2").withColumnRenamed("wsum", "s2"),
                  "id2")
            .select("id1", "id2",
                    (F.col(weight_col) / F.col("s1")
                     + F.col(weight_col) / F.col("s2")).alias("w"))
            .collect()
        )
    else:
        rows = e.select("id1", "id2", F.col(weight_col).alias("w")).collect()
    if len(rows) > DRIVER_EDGE_LIMIT:
        raise ValueError("center clustering input too large")
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    center: dict = {}
    is_center: set = set()
    is_member: set = set()
    for id1, id2, w in rows:
        c1, m1 = id1 in is_center, id1 in is_member
        c2, m2 = id2 in is_center, id2 in is_member
        if (c1 and c2) or (m1 and m2) or (c1 and m2) or (c2 and m1):
            continue
        if not c1 and not m1 and not c2 and not m2:
            is_center.add(id1)
            center[id1] = id1
            is_member.add(id2)
            center[id2] = id1
        elif c1 and not c2 and not m2:
            is_member.add(id2)
            center[id2] = center[id1]
        elif c2 and not c1 and not m1:
            is_member.add(id1)
            center[id1] = center[id2]
    out = [(k, v) for k, v in center.items()]
    return edges.sparkSession.createDataFrame(out, "eid long, cluster_id long")


def best_match_clustering(edges: DataFrame, similarity_threshold: float = 0.5,
                          weight_col: str = "sim") -> DataFrame:
    """BestMatchClustering (clustering.py:641-727): per source entity
    keep its best not-yet-matched target, desc-weight order. Driver-side
    greedy; returns matched pairs."""
    spark = edges.sparkSession
    rows = _collect_edges(edges.where(F.col(weight_col) > similarity_threshold),
                          weight_col)
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    taken_src: set = set()
    taken_dst: set = set()
    out = []
    for id1, id2, w in rows:
        if id1 in taken_src or id2 in taken_dst:
            continue
        taken_src.add(id1)
        taken_dst.add(id2)
        out.append((id1, id2, float(w)))
    return spark.createDataFrame(out, "id1 long, id2 long, weight double")


def markov_clustering(edges: DataFrame, similarity_threshold: float = 0.5,
                      cluster_threshold: float = 0.001,
                      matrix_similarity_threshold: float = 1e-5,
                      similarity_checks_limit: int = 10,
                      weight_col: str = "sim",
                      prune_below: float | None = None) -> DataFrame:
    """MarkovClustering (reference clustering.py:1055-1171) as iterated
    sparse matrix algebra on an (i, j, v) DataFrame — matrix product =
    join on the inner index + groupBy(i, j) sum; inflation = elementwise
    power; normalization = column-sum join. (The reference's method
    names are swapped: its inflate() is the matrix product and its
    expand() the elementwise square — semantics reproduced, not names.)

    Per round: product, normalize, square, normalize, equilibrium check
    on shared indices (|Δ| <= matrix_similarity_threshold), with
    localCheckpoint truncating lineage. ``prune_below`` optionally drops
    near-zero entries each round — the standard MCL sparsity guard for
    scale (reference keeps exact zeros only; default None is faithful).
    Returns (eid, cluster_id) from components of entries >
    cluster_threshold.
    """
    sym = edges.where(F.col(weight_col) > similarity_threshold).select(
        F.col("id1").alias("i"), F.col("id2").alias("j"),
        F.col(weight_col).cast("double").alias("v"))
    m = sym.union(sym.select(F.col("j").alias("i"), F.col("i").alias("j"), "v"))
    nodes = m.select(F.col("i").alias("n")).distinct()
    loops = nodes.select(F.col("n").alias("i"), F.col("n").alias("j"),
                         F.lit(1.0).alias("v"))
    # self loop assignment overwrites any (i,i) entry
    m = m.where(F.col("i") != F.col("j")).union(loops)

    def normalize(mm: DataFrame) -> DataFrame:
        csum = mm.groupBy("j").agg(F.sum("v").alias("_s"))
        return mm.join(csum, "j").select(
            "i", "j",
            F.when(F.col("_s") != 0, F.col("v") / F.col("_s"))
            .otherwise(F.col("v")).alias("v"))

    def product(mm: DataFrame) -> DataFrame:
        a = mm.select(F.col("i"), F.col("j").alias("k"), F.col("v").alias("va"))
        b = mm.select(F.col("i").alias("k"), F.col("j"), F.col("v").alias("vb"))
        return a.join(b, "k").groupBy("i", "j").agg(
            F.sum(F.col("va") * F.col("vb")).alias("v"))

    m = normalize(m).localCheckpoint()
    for _ in range(similarity_checks_limit):
        prev = m
        m = normalize(product(m))
        m = normalize(m.select("i", "j", (F.col("v") * F.col("v")).alias("v")))
        if prune_below is not None:
            m = m.where(F.col("v") >= prune_below)
        m = m.localCheckpoint()
        drift = (
            m.join(prev.select(F.col("i"), F.col("j"),
                               F.col("v").alias("_pv")), ["i", "j"])
            .agg(F.max(F.abs(F.col("v") - F.col("_pv"))).alias("d"))
            .collect()[0]["d"]
        )
        if drift is not None and drift <= matrix_similarity_threshold:
            break

    final = (
        m.where(F.col("i") != F.col("j"))
        .select(F.least("i", "j").alias("id1"), F.greatest("i", "j").alias("id2"),
                F.col("v"))
        .groupBy("id1", "id2").agg(F.max("v").alias("v"))
        .where(F.col("v") > cluster_threshold)
    )
    return connected_components(final.select("id1", "id2"), nodes=nodes)


def clusters_to_pairs(assign: DataFrame) -> DataFrame:
    """(eid, cluster_id) -> intra-cluster pairs (id1<id2) — the
    export_to_pairs sink (clustering.py:381-417) as a self-join."""
    a = assign.select(F.col("cluster_id"), F.col("eid").alias("id1"))
    b = assign.select(F.col("cluster_id"), F.col("eid").alias("id2"))
    return (
        a.join(b, "cluster_id")
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
