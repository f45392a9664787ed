"""Schema clustering: cluster the ATTRIBUTES of two datasets first,
then run entity resolution only within each attribute cluster's row
subsets (ref src/pyjedai/schema/clustering.py:45-277,
SchemaClustering.process).

Reference semantics preserved exactly:

- each attribute becomes a tiny "document": its name (``on='names'``),
  the space-joined string of its column values (``'values'``), or name
  + values (``'hybrid'``); pandas ``astype(str)`` turns missing values
  into the literal ``'nan'`` — replicated (clustering.py:146-169);
- the attribute documents run through the reference's default schema
  clustering workflow (workflow.py:755-767): StandardBlocking ->
  BlockPurging(1.0) -> BlockFiltering(0.8) -> EntityMatching -> CCER
  ConnectedComponents (which keeps ONLY 2-element clusters,
  clustering.py:465-467). NOTE the reference config dict puts
  ``metric='cosine', similarity_threshold=0.35`` OUTSIDE ``params`` so
  workflow.run ignores them and EntityMatching runs with its DEFAULTS
  (dice, whitespace tokens, threshold 0.0) — we default to the
  EFFECTIVE config (dice/0.0) and expose the knobs;
- every attribute not in a kept cluster lands in ONE shared "redundant"
  cluster appended at the end (clustering.py:195-204) — cluster_id -1;
- only clusters containing attributes from BOTH datasets spawn an ER
  sub-problem (contains_attributes_from_both, clustering.py:206-211);
  a row belongs to the sub-problem when ANY of the cluster's attributes
  on its side is non-null (clustering.py:219-236).

Scale deltas (deliberate, documented):

- the reference loops python-side over clusters, running one full ER
  workflow per cluster (clustering.py:255-273). At web scale the right
  shape is ONE batched plan with ``cluster_id`` folded into the
  blocking key: blocks never span clusters, so per-cluster independence
  is free and the loop disappears (:func:`schema_clustered_er`). The
  reference-faithful per-cluster loop is kept for workflows whose
  scalar stages (purge thresholds, greedy UMC) are inherently
  per-cluster (:func:`schema_clustered_er_looped`);
- the reference collapses each cluster's pairs into a dict keyed by
  id1 (transform_mapping_to_ids, clustering.py:65-84), silently
  overwriting earlier matches in python-set iteration order; we return
  the full distinct pair set instead (strictly more informative and
  deterministic);
- ``'values'`` mode concatenates whole columns; ``max_values`` bounds
  the per-attribute sample (first N by id) so the attribute documents
  stay driver-safe at 10^12 rows. The default (10,000) is exact on any
  input with fewer rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions import text as T
from .operators import block_cleaning as BC
from .operators import ccer as X
from .operators import matching as M

# composite node id for per-cluster connected components: one CC run
# over (cluster, entity) pairs instead of a driver loop. Entity ids
# must stay below this offset (asserted).
_ENC = 1 << 40


def attribute_entities(df: DataFrame, on: str = "names",
                       id_col: str = "doc_id",
                       columns: list[str] | None = None,
                       aid_offset: int = 0,
                       max_values: int | None = 10_000) -> DataFrame:
    """(aid, attr, text): one row per column of ``df``
    (clustering.py:146-169). ``aid`` follows the reference's column
    order starting at ``aid_offset`` (D2 attributes continue after
    D1's). ``'values'``/``'hybrid'`` texts are the column's values
    joined by spaces in ``id_col`` order (missing -> literal 'nan',
    the pandas astype(str) quirk), truncated to the first
    ``max_values`` rows."""
    if on not in ("names", "values", "hybrid"):
        raise ValueError("on parameter must be one of 'names', 'values' "
                         "or 'hybrid'")
    cols = columns if columns is not None else list(df.columns)
    spark = df.sparkSession
    names = spark.createDataFrame(
        [(aid_offset + i, c) for i, c in enumerate(cols)],
        "aid long, attr string")
    if on == "names":
        return names.withColumn("text", F.col("attr"))

    if max_values is not None:
        # bound the sample BEFORE the collect (TakeOrdered of N rows)
        # so the per-attribute aggregate never holds more than
        # max_values values — exact whenever the input is smaller
        df = df.orderBy(id_col).limit(max_values)

    def col_text(c):
        v = F.coalesce(F.col(c).cast("string"), F.lit("nan"))
        arr = F.array_sort(F.collect_list(F.struct(
            F.col(id_col).alias("o"), v.alias("v"))))
        return F.concat_ws(" ", F.transform(arr, lambda x: x["v"])).alias(c)

    vals = df.agg(*[col_text(c) for c in cols])
    long = vals.select(F.explode(F.create_map(*[
        x for c in cols for x in (F.lit(c), F.col(c))
    ])).alias("attr", "vtext"))
    out = names.join(long, "attr")
    text = (F.concat_ws(" ", "attr", "vtext") if on == "hybrid"
            else F.col("vtext"))
    return out.select("aid", "attr", text.alias("text"))


def schema_attribute_clusters(d1: DataFrame, d2: DataFrame,
                              on: str = "values",
                              id_col: str = "doc_id",
                              id_col2: str | None = None,
                              columns1: list[str] | None = None,
                              columns2: list[str] | None = None,
                              metric: str = "dice",
                              similarity_threshold: float = 0.0,
                              purging_smoothing: float = 1.0,
                              filtering_ratio: float = 0.8,
                              max_values: int | None = 10_000) -> DataFrame:
    """(cluster_id, aid, attr, side): the reference's attribute-level
    workflow end-to-end. cluster_id = the component's minimum aid for
    kept (2-element, cross-side by construction) clusters; -1 = the
    appended redundant cluster of every unclustered attribute
    (clustering.py:195-204)."""
    cols1 = columns1 if columns1 is not None else list(d1.columns)
    cols2 = columns2 if columns2 is not None else list(d2.columns)
    a1 = attribute_entities(d1, on, id_col, cols1, 0, max_values)
    a2 = attribute_entities(d2, on, id_col2 or id_col, cols2, len(cols1),
                            max_values)

    p = X.ccer_blocking(a1, a2, id_col="aid", text_col="text")
    p = BC.block_purging(p, purging_smoothing, dirty=False)
    p = BC.block_filtering(p, filtering_ratio, dirty=False)
    pairs = X.ccer_pairs(p)
    attrs = a1.withColumn("side", F.lit(1)).unionByName(
        a2.withColumn("side", F.lit(2)))
    matches = M.entity_matching(
        pairs, attrs, metric=metric,
        similarity_threshold=similarity_threshold,
        id_col="aid", text_col="text", round_to=6)
    cc = X.ccc_size2(matches.select("id1", "id2"))

    clustered = cc.select(F.col("eid").alias("aid"), "cluster_id")
    out = attrs.join(clustered, "aid", "left").select(
        F.coalesce("cluster_id", F.lit(-1)).alias("cluster_id"),
        "aid", "attr", "side")
    return out


def cluster_member_rows(d1: DataFrame, d2: DataFrame,
                        clusters: DataFrame,
                        id_col: str = "doc_id",
                        id_col2: str | None = None) -> DataFrame:
    """(cluster_id, eid, side): rows of each qualifying cluster's ER
    sub-problem. Qualifying = the cluster has attributes from BOTH
    sides (clustering.py:206-211); membership = the row is non-null in
    at least one of the cluster's attributes on its side
    (clustering.py:219-236, pandas ``notna``)."""
    sides = clusters.groupBy("cluster_id").agg(
        F.max((F.col("side") == 1).cast("int")).alias("_s1"),
        F.max((F.col("side") == 2).cast("int")).alias("_s2"))
    ok = sides.where((F.col("_s1") == 1) & (F.col("_s2") == 1)) \
        .select("cluster_id")
    qual = clusters.join(ok, "cluster_id")

    def melt_nonnull(df, side):
        idc = id_col if side == 1 else (id_col2 or id_col)
        cols = [c for c in df.columns]
        pairs = df.select(
            F.col(idc).alias("eid"),
            F.explode(F.array(*[
                F.struct(F.lit(c).alias("attr"),
                         F.col(c).isNotNull().alias("nn")) for c in cols
            ])).alias("x")
        ).select("eid", "x.attr", "x.nn").where("nn")
        return pairs.join(
            qual.where(F.col("side") == side).select("cluster_id", "attr"),
            "attr").select("cluster_id", "eid").distinct() \
            .withColumn("side", F.lit(side))

    return melt_nonnull(d1, 1).unionByName(melt_nonnull(d2, 2))


def schema_clustered_er(d1: DataFrame, d2: DataFrame,
                        clusters: DataFrame,
                        docs1: DataFrame, docs2: DataFrame,
                        id_col: str = "doc_id", id_col2: str | None = None,
                        text_col: str = "text",
                        metric: str = "cosine",
                        similarity_threshold: float = 0.35,
                        round_to: int = 6) -> DataFrame:
    """(cluster_id, id1, id2): BATCHED per-cluster entity resolution —
    StandardBlocking with the cluster id folded into the block key
    (blocks never span clusters), cross-side candidate pairs,
    EntityMatching, and per-cluster 2-element connected components, all
    in one plan (the scale path replacing the reference's python loop,
    clustering.py:255-273). ``docs1``/``docs2`` carry the ER text per
    row (the reference concatenates the original data's configured
    attributes — pass that projection)."""
    mem = cluster_member_rows(d1, d2, clusters, id_col, id_col2)

    def side_docs(docs, side):
        idc = id_col if side == 1 else (id_col2 or id_col)
        return mem.where(F.col("side") == side).join(
            docs.select(F.col(idc).alias("eid"), text_col), "eid")

    m1, m2 = side_docs(docs1, 1), side_docs(docs2, 2)

    # cluster-scoped CCER standard blocking: key = (cluster_id, token),
    # both sides required per scoped block
    def postings(m):
        return m.select(
            "cluster_id", "eid", "side",
            F.explode(T.tokens(text_col)).alias("tok")).distinct()

    p = postings(m1).unionByName(postings(m2))
    w = Window.partitionBy("cluster_id", "tok")
    p = (p.withColumn("_n1", F.sum((F.col("side") == 1).cast("int")).over(w))
          .withColumn("_n2", F.sum((F.col("side") == 2).cast("int")).over(w))
          .where((F.col("_n1") >= 1) & (F.col("_n2") >= 1)))

    a = p.where(F.col("side") == 1).select(
        "cluster_id", "tok", F.col("eid").alias("id1"))
    b = p.where(F.col("side") == 2).select(
        "cluster_id", "tok", F.col("eid").alias("id2"))
    pairs = a.join(b, ["cluster_id", "tok"]) \
        .select("cluster_id", "id1", "id2").distinct()

    # composite (cluster, entity) node ids -> ONE matching + CC pass
    docs_enc = (
        m1.unionByName(m2)
        .select(((F.col("cluster_id") + 2) * _ENC + F.col("eid")).alias("enc"),
                F.col(text_col)))
    pairs_enc = pairs.select(
        ((F.col("cluster_id") + 2) * _ENC + F.col("id1")).alias("id1"),
        ((F.col("cluster_id") + 2) * _ENC + F.col("id2")).alias("id2"))
    matches = M.entity_matching(
        pairs_enc, docs_enc, metric=metric,
        similarity_threshold=similarity_threshold,
        id_col="enc", text_col=text_col, round_to=round_to)
    cc = X.ccc_size2(matches.select("id1", "id2"))

    node = cc.select(
        (F.col("eid") % _ENC).alias("eid"),
        F.floor(F.col("eid") / _ENC).cast("long").alias("_cid2"),
        "cluster_id")
    sided = node.join(
        mem.select("cluster_id", "eid", "side").withColumn(
            "_cid2", F.col("cluster_id") + 2).drop("cluster_id"),
        ["eid", "_cid2"])
    out = (
        sided.where(F.col("side") == 1)
        .select("cluster_id", (F.col("_cid2") - 2).alias("schema_cluster"),
                F.col("eid").alias("id1"))
        .join(sided.where(F.col("side") == 2)
              .select("cluster_id", F.col("eid").alias("id2")),
              "cluster_id")
        .select(F.col("schema_cluster").alias("cluster_id"), "id1", "id2")
        .distinct())
    return out


def schema_clustered_er_looped(d1: DataFrame, d2: DataFrame,
                               clusters: DataFrame,
                               docs1: DataFrame, docs2: DataFrame,
                               workflow=None,
                               id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """Reference-faithful per-cluster loop (clustering.py:255-273): run
    a full BlockingBasedWorkFlow per qualifying cluster and union the
    resulting pairs. Use when the workflow has per-dataset scalar
    stages (purge thresholds, greedy UMC) that cannot be batched; the
    cluster count is attribute-bounded, so the loop is driver-cheap
    even at web scale."""
    from .workflow import BlockingBasedWorkFlow

    wf = workflow or BlockingBasedWorkFlow.best_ccer()
    mem = cluster_member_rows(d1, d2, clusters, id_col).localCheckpoint()
    cids = [r["cluster_id"]
            for r in mem.select("cluster_id").distinct().collect()]
    spark = d1.sparkSession
    outs = []
    for cid in sorted(cids):
        sub = mem.where(F.col("cluster_id") == cid)
        s1 = docs1.join(sub.where(F.col("side") == 1).select(
            F.col("eid").alias(id_col)), id_col)
        s2 = docs2.join(sub.where(F.col("side") == 2).select(
            F.col("eid").alias(id_col)), id_col)
        res = wf.run(s1, id_col=id_col, text_col=text_col, d2=s2)
        # workflow clustering output: (eid, cluster_id) components ->
        # cross-side pairs (size-2 CCER components are one per side)
        pair = (res.join(sub.withColumnRenamed("cluster_id", "_sc"), "eid")
                .groupBy("cluster_id")
                .agg(F.min(F.when(F.col("side") == 1, F.col("eid")))
                     .alias("id1"),
                     F.min(F.when(F.col("side") == 2, F.col("eid")))
                     .alias("id2"))
                .where(F.col("id1").isNotNull() & F.col("id2").isNotNull())
                .select(F.lit(cid).alias("cluster_id"), "id1", "id2"))
        outs.append(pair)
    if not outs:
        return spark.createDataFrame(
            [], "cluster_id long, id1 long, id2 long")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.distinct()
