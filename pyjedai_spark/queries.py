"""Query registry: every implemented operator exposed as
(spark, sf_dir) -> DataFrame, plus a DuckDB-executable ANSI-SQL oracle
string per query (driver correctness gate; see __spark_entry__.py).

Oracle strategy: each Spark plan is re-expressed in portable SQL over
the same parquet views. Floating-point outputs are rounded to 6 dp on
BOTH sides; prune-rule comparisons share the same EPS guard band, so
retained-row sets agree across engines. Rank orders only ever tie-break
on exactly-representable weights (int ratios), never on accumulated
float sums.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .datamodel import load_documents
from .functions import analysis as A
from .functions import vectors as V
from .functions import text as TXT
from .operators import block_building as BB
from .operators import block_cleaning as BC
from .operators import clustering as CL
from .operators import comparison_cleaning as CC
from .operators import dedup as DD
from .operators import joins as J
from .operators import matching as M
from .operators import progressive as PR
from .operators import sorted_neighborhood as SN

EPS = 1e-9

# --------------------------------------------------------------- SQL lego

TOK = """tok AS (
  SELECT doc_id AS eid,
         unnest(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '[\\W_]'), x -> x <> ''))) AS key
  FROM documents)"""

SB = TOK + """,
sb AS (
  SELECT key, eid FROM tok
  QUALIFY count(*) OVER (PARTITION BY key) >= 2)"""


def _cards(src: str = "sb") -> str:
    return f"""cards AS (
  SELECT key, count(*) AS block_size,
         CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS cardinality
  FROM {src} GROUP BY key)"""


def _purging_sql(src: str = "sb", sf: float = 1.0, out: str = "pp") -> str:
    """Level-scan purging threshold (block_cleaning.py:158-198) in SQL:
    cumulative level table; break index = largest i with the reference's
    inequality; fallback = 3rd level; keep cardinality <= threshold."""
    return f"""{_cards(src)},
levels AS (
  SELECT cardinality, sum(block_size) AS bs, sum(cardinality) AS cc
  FROM cards GROUP BY cardinality),
cum AS (
  SELECT cardinality,
         sum(bs) OVER (ORDER BY cardinality) AS cum_bs,
         sum(cc) OVER (ORDER BY cardinality) AS cum_cc,
         row_number() OVER (ORDER BY cardinality) AS rn
  FROM levels),
cand AS (
  SELECT c.rn AS i_rn, p.cardinality AS thr_card
  FROM cum c JOIN cum p ON p.rn = c.rn + 1
  WHERE c.rn >= 2
    AND c.cum_bs * p.cum_cc < {sf} * c.cum_cc * p.cum_bs),
thr AS (
  SELECT CASE WHEN (SELECT count(*) FROM cum) <= 2 THEN 0
         ELSE coalesce((SELECT thr_card FROM cand ORDER BY i_rn DESC LIMIT 1),
                       (SELECT cardinality FROM cum WHERE rn = 3))
         END AS t),
{out} AS (
  SELECT s.key, s.eid FROM {src} s
  JOIN cards c ON c.key = s.key, thr
  WHERE c.cardinality <= thr.t)"""


def _filtering_sql(src: str, ratio: float, out: str, cards_name: str) -> str:
    """BlockFiltering (block_cleaning.py:82-97): keep each entity's
    java_round(ratio*n) smallest blocks, ties by key; re-drop singletons."""
    return f"""{cards_name} AS (
  SELECT key, CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS cardinality
  FROM {src} GROUP BY key),
{out}_ranked AS (
  SELECT p.key, p.eid,
         row_number() OVER (PARTITION BY p.eid
                            ORDER BY c.cardinality, p.key) AS rn,
         count(*) OVER (PARTITION BY p.eid) AS n
  FROM {src} p JOIN {cards_name} c ON c.key = p.key),
{out} AS (
  SELECT key, eid FROM {out}_ranked
  WHERE rn <= floor({ratio} * n + 0.5)
  QUALIFY count(*) OVER (PARTITION BY key) >= 2)"""


def _edges_sql(src: str, scheme: str, out: str = "e") -> str:
    """Edge weights over postings ``src`` (Dirty-ER). Supports CBS/JS/
    COSINE/DICE here (the exactly-representable schemes used by rank
    queries); weight column ``w``."""
    base = f"""{out}_nb AS (SELECT eid, count(*) AS nb FROM {src} GROUP BY eid),
{out}_raw AS (
  SELECT a.eid AS id1, b.eid AS id2, count(*) AS cbs
  FROM {src} a JOIN {src} b ON a.key = b.key AND a.eid < b.eid
  GROUP BY 1, 2)"""
    if scheme == "CBS":
        wexpr = "CAST(cbs AS DOUBLE)"
    elif scheme == "JS":
        wexpr = "CAST(cbs AS DOUBLE) / (n1.nb + n2.nb - cbs)"
    elif scheme == "COSINE":
        wexpr = "CAST(cbs AS DOUBLE) / (sqrt(CAST(n1.nb AS DOUBLE)) * sqrt(CAST(n2.nb AS DOUBLE)))"
    elif scheme == "DICE":
        wexpr = "2.0 * cbs / (n1.nb + n2.nb)"
    else:
        raise ValueError(scheme)
    return base + f""",
{out} AS (
  SELECT r.id1, r.id2, r.cbs, {wexpr} AS w
  FROM {out}_raw r
  JOIN {out}_nb n1 ON n1.eid = r.id1
  JOIN {out}_nb n2 ON n2.eid = r.id2)"""


def _cnp_sql(src: str, out: str = "cnp", scheme: str = "JS") -> str:
    """CardinalityNodePruning (comparison_cleaning.py:475-546): per-node
    top-k by (w desc, neighbor desc); validity = reciprocal-once-or-
    unclaimed; k = floor(max(1, assignments/num_docs))."""
    return _edges_sql(src, scheme, f"{out}_e") + f""",
{out}_bidir AS (
  SELECT id1 AS u, id2 AS v, w FROM {out}_e
  UNION ALL SELECT id2, id1, w FROM {out}_e),
{out}_k AS (
  SELECT CAST(floor(greatest(1.0,
      (SELECT count(*) FROM {src}) * 1.0
      / (SELECT count(*) FROM documents))) AS BIGINT) AS kv),
{out}_top AS (
  SELECT u, v, w FROM (
    SELECT u, v, w,
           row_number() OVER (PARTITION BY u ORDER BY w DESC, v DESC) AS rn
    FROM {out}_bidir)
  WHERE rn <= (SELECT kv FROM {out}_k)),
{out} AS (
  SELECT least(t.u, t.v) AS id1, greatest(t.u, t.v) AS id2, max(t.w) AS weight
  FROM {out}_top t LEFT JOIN {out}_top r ON r.u = t.v AND r.v = t.u
  WHERE r.u IS NULL OR t.u < t.v
  GROUP BY 1, 2)"""


def _matching_cosine_sql(pairs_src: str, threshold: float, out: str = "mt") -> str:
    """EntityMatching(cosine, whitespace sets) on candidate pairs:
    exact-set -> 1.0, empty -> 0.0, keep sim > threshold
    (matching.py:493-537 + string_matchers.py:39-54)."""
    return f"""{out}_wt AS (
  SELECT doc_id AS eid,
         list_sort(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))) AS t
  FROM documents),
{out} AS (
  SELECT id1, id2, sim FROM (
    SELECT p.id1, p.id2,
           round(CASE WHEN a.t = b.t THEN 1.0
                 WHEN len(a.t) = 0 OR len(b.t) = 0 THEN 0.0
                 ELSE len(list_intersect(a.t, b.t))
                      / (sqrt(CAST(len(a.t) AS DOUBLE)) * sqrt(CAST(len(b.t) AS DOUBLE)))
                 END, 6) AS sim
    FROM {pairs_src} p
    JOIN {out}_wt a ON a.eid = p.id1
    JOIN {out}_wt b ON b.eid = p.id2)
  WHERE sim > {threshold})"""


def _cc_sql(edges_src: str) -> str:
    """Connected components over (id1,id2) edges + all docs as
    singletons, via recursive closure to the component minimum."""
    return f"""bidir_cc AS (
  SELECT id1 AS u, id2 AS v FROM {edges_src}
  UNION SELECT id2, id1 FROM {edges_src}),
reach(u, v) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.u, b.v FROM reach r JOIN bidir_cc b ON r.v = b.u)"""


# MinHash SQL generation ---------------------------------------------------

def _tokhash_sql(shingle: int) -> str:
    """per-doc list of portable u32 token(-shingle) hashes, +
    the shingle list itself for jaccard."""
    if shingle == 1:
        sh = """sh AS (
  SELECT doc_id AS eid,
         list_distinct(list_filter(regexp_split_to_array(lower(text),
             '[\\W_]'), x -> x <> '')) AS sl
  FROM documents)"""
    else:
        sh = f"""t0 AS (
  SELECT doc_id AS eid,
         list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                     x -> x <> '') AS tl
  FROM documents),
sh AS (
  SELECT eid, CASE WHEN len(tl) < {shingle} THEN []
         ELSE list_distinct(list_transform(range(1, len(tl) - {shingle} + 2),
              i -> array_to_string(list_slice(tl, i, i + {shingle} - 1), ' ')))
         END AS sl
  FROM t0)"""
    return f"""{sh},
hx AS (
  SELECT eid, sl,
         list_transform(sl, t ->
             CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT)) AS hl
  FROM sh)"""


def _minhash_sig_sql(k: int) -> str:
    coeffs = DD.minhash_coeffs(k)
    exprs = ",\n    ".join(
        f"CASE WHEN len(hl)=0 THEN {DD.P} ELSE "
        f"list_min(list_transform(hl, h -> (h * {a} + {b}) % {DD.P})) END"
        for a, b in coeffs
    )
    return f"""sig AS (
  SELECT eid, [{exprs}] AS s FROM hx)"""


def _bands_sql(bands: int, rows: int) -> str:
    sels = "\n  UNION ALL ".join(
        f"SELECT eid, {b} AS band_idx, "
        f"md5(array_to_string(list_slice(s, {b * rows + 1}, {b * rows + rows}), '-'))"
        f" AS band_hash FROM sig"
        for b in range(bands)
    )
    return f"bands AS (\n  {sels})"


def _simhash_sql() -> str:
    sums = ", ".join(
        f"sum(((h >> {j}) & 1) * 2 - 1) AS b{j}" for j in range(DD.SIMHASH_BITS))
    recompose = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(DD.SIMHASH_BITS))
    return f"""{_tokhash_sql(1)},
hh AS (SELECT eid, unnest(hl) AS h FROM hx),
bits AS (SELECT eid, {sums} FROM hh GROUP BY eid),
sims AS (SELECT eid, {recompose} AS simhash FROM bits)"""


# ------------------------------------------------------------- registry

def _quality_sql() -> str:
    """CTE chain qt -> qfeat -> qsc(doc_id, features, quality_score):
    the quality_score oracle as a composable fragment (names prefixed
    q* so it nests beside the minhash/blocking fragments)."""
    en_arr = "[" + ", ".join(f"'{w}'" for w in A.STOPWORDS["en"]) + "]"
    return f"""qt AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                     x -> x <> '') AS tl
  FROM documents),
qfeat AS (
  SELECT doc_id,
         len(tl) AS n_tokens,
         CASE WHEN len(tl) > 0 THEN
           round(list_sum(list_transform(tl, x -> len(x))) * 1.0 / len(tl), 6)
         ELSE 0.0 END AS avg_token_len,
         CASE WHEN len(tl) > 0 THEN
           round(len(list_filter(tl, x -> list_contains({en_arr}, x))) * 1.0
                 / len(tl), 6)
         ELSE 0.0 END AS stopword_ratio,
         CASE WHEN len(tl) > 0 THEN
           round(len(list_distinct(tl)) * 1.0 / len(tl), 6)
         ELSE 0.0 END AS unique_ratio,
         CASE WHEN len(text) > 0 THEN
           round(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0
                 / len(text), 6)
         ELSE 0.0 END AS alpha_ratio
  FROM qt),
qsc AS (
  SELECT doc_id, n_tokens, avg_token_len, stopword_ratio, unique_ratio,
         alpha_ratio,
         round((CASE WHEN avg_token_len >= 3 AND avg_token_len <= 10
                     THEN 0.25 ELSE 0 END)
             + (CASE WHEN stopword_ratio >= 0.05 THEN 0.25 ELSE 0 END)
             + (CASE WHEN unique_ratio >= 0.3 THEN 0.25 ELSE 0 END)
             + (CASE WHEN alpha_ratio >= 0.6 THEN 0.25 ELSE 0 END), 2)
         AS quality_score
  FROM qfeat)"""


def _docs(spark, sf_dir):
    return load_documents(spark, sf_dir)


def q_sb_blocks(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    return p.groupBy(F.col("key").alias("token")).agg(
        F.count("*").alias("block_size"))


def q_sb_block_stats(spark, sf_dir):
    return BB.block_stats(BB.standard_blocking(_docs(spark, sf_dir)))


def q_block_purging(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    purged = BC.block_purging(p, smoothing_factor=1.0)
    return (
        BC.block_cardinalities(purged)
        .select(F.col("key").alias("token"), "block_size", "cardinality")
    )


def q_block_filtering(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    return BC.block_filtering(p, 0.8).select(F.col("key").alias("token"),
                                             F.col("eid").alias("doc_id"))


def q_comparison_propagation(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    p = BC.block_filtering(BB.standard_blocking(docs), 0.8)
    return CC.comparison_propagation(p)


def q_wep_cbs(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    e = CC.weighted_edge_pruning(p, "CBS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_wep_js(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    e = CC.weighted_edge_pruning(p, "JS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_wep_ecbs(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    e = CC.weighted_edge_pruning(p, "ECBS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_wep_x2(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    e = CC.weighted_edge_pruning(p, "X2")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_wep_ejs(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    e = CC.weighted_edge_pruning(p, "EJS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_wnp_cbs(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    e = CC.weighted_node_pruning(p, "CBS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_rwnp_js(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    e = CC.weighted_node_pruning(p, "JS", reciprocal=True)
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_blast_cosine(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    e = CC.blast(p, "COSINE")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_cep_js(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    e = CC.cardinality_edge_pruning(p, "JS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_cnp_js(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    p = BB.standard_blocking(docs)
    e = CC.cardinality_node_pruning(p, "JS", num_entities=docs.count())
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_rcnp_js(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    p = BB.standard_blocking(docs)
    e = CC.cardinality_node_pruning(p, "JS", num_entities=docs.count(),
                                    reciprocal=True)
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_entity_matching_cosine(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    p = BB.standard_blocking(docs)
    cands = CC.cardinality_node_pruning(p, "JS", num_entities=docs.count())
    return M.entity_matching(cands.select("id1", "id2"), docs, metric="cosine",
                             tokenizer="white_space_tokenizer",
                             similarity_threshold=0.55, round_to=6)


def q_der_dedup_clusters(spark, sf_dir):
    """Flagship: the reference best-DER chain end-to-end -> clusters."""
    from .pipeline import der_dedup_pipeline

    docs = _docs(spark, sf_dir)
    out = der_dedup_pipeline(docs)
    return out.select(F.col("eid").alias("doc_id"), "cluster_id")


def q_exact_dedup(spark, sf_dir):
    return DD.exact_dedup(_docs(spark, sf_dir)).select(
        F.col("eid").alias("doc_id"), "fingerprint",
        F.col("group_size").cast("long").alias("group_size"),
        F.col("is_duplicate").cast("long").alias("is_duplicate"),
        F.col("keep").cast("long").alias("keep"))


def q_doc_fingerprint(spark, sf_dir):
    return A.doc_fingerprint(_docs(spark, sf_dir)).select(
        F.col("eid").alias("doc_id"), "fingerprint")


def q_minhash_bands(spark, sf_dir):
    sigs = DD.minhash_signatures(_docs(spark, sf_dir), k=32, shingle_size=3)
    return DD.lsh_bands(sigs, bands=8, rows=4).select(
        F.col("eid").alias("doc_id"),
        F.col("band_idx").cast("long").alias("band_idx"), "band_hash")


def q_minhash_lsh_pairs(spark, sf_dir):
    return DD.lsh_candidate_pairs(_docs(spark, sf_dir), k=32, bands=8,
                                  shingle_size=3, max_bucket=None)


def q_minhash_lsh_pairs_salted(spark, sf_dir):
    """Same pair set as minhash_lsh_pairs, enumerated via the salted
    mega-block splitter (chunk=32 at test scale forces multi-chunk
    blocks, proving the skew-proof path is output-identical)."""
    return DD.lsh_candidate_pairs(_docs(spark, sf_dir), k=32, bands=8,
                                  shingle_size=3, max_bucket=None,
                                  salted_chunk=32)


def q_minhash_near_dup(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    cands = DD.lsh_candidate_pairs(docs, k=32, bands=8, shingle_size=3,
                                   max_bucket=None)
    return DD.jaccard_verify(cands, docs, threshold=0.5, shingle_size=3)


def q_tiered_exact_dedup(spark, sf_dir):
    """Tiered dedup, exact groups: survivor of each content-fingerprint
    group is the HIGHEST-quality member (quality_score desc, tie min
    id) instead of the min-id default — the keep-the-best-copy policy
    cross-dump training pipelines apply."""
    docs = _docs(spark, sf_dir)
    groups = DD.exact_dedup(docs).select(
        "eid", F.col("fingerprint").alias("cluster_id"))
    qs = A.quality_score(docs).select("eid", F.col("quality_score").alias("rank"))
    out = DD.cluster_survivors(groups, qs)
    return out.select(F.col("eid").alias("doc_id"), "cluster_id",
                      "survivor",
                      F.col("is_survivor").cast("long").alias("is_survivor"))


def q_tiered_near_dup(spark, sf_dir):
    """Tiered dedup over MinHash-LSH near-dup clusters: the full
    signature->bands->verify->connected-components chain, then each
    cluster keeps its best-quality member (not the cluster-min id)."""
    from .pipeline import minhash_dedup_pipeline

    docs = _docs(spark, sf_dir)
    clusters = minhash_dedup_pipeline(docs, id_col="doc_id",
                                      shingle_size=3,
                                      jaccard_threshold=0.5,
                                      max_bucket=None)
    qs = A.quality_score(docs).select("eid", F.col("quality_score").alias("rank"))
    out = DD.cluster_survivors(clusters, qs)
    return out.select(F.col("eid").alias("doc_id"),
                      F.col("cluster_id").cast("long").alias("cluster_id"),
                      "survivor",
                      F.col("is_survivor").cast("long").alias("is_survivor"))


def q_simhash_signatures(spark, sf_dir):
    return DD.simhash_signatures(_docs(spark, sf_dir)).select(
        F.col("eid").alias("doc_id"), "simhash")


def q_simhash_pairs(spark, sf_dir):
    return DD.simhash_candidate_pairs(_docs(spark, sf_dir), max_hamming=3,
                                      max_bucket=None).select(
        "id1", "id2", F.col("hamming").cast("long").alias("hamming"))


def q_substring_dedup(spark, sf_dir):
    return DD.substring_fingerprint_pairs(_docs(spark, sf_dir), w=10,
                                          max_bucket=None)


def q_source_quota(spark, sf_dir):
    """Per-source quota sampling (cap 12 docs per source by md5(id)
    order) via the histogram-split exact top-N — output identical to
    the naive per-key window, which is what the oracle runs."""
    from pyjedai_spark.operators.sampling import source_quota_sample
    out = source_quota_sample(_docs(spark, sf_dir), quota=12)
    return out.select("doc_id", "source")


def q_duplicate_spans(spark, sf_dir):
    """Maximal duplicated spans (merged runs of shared 10-token
    windows) between doc pairs — the long-span dedup output."""
    return DD.duplicate_spans(_docs(spark, sf_dir), w=10)


def q_ngram_jaccard(spark, sf_dir):
    return DD.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)


def q_ejoin_cosine(spark, sf_dir):
    # 0.95: a near-duplicate threshold — at 0.9 the synthetic corpus'
    # 57-word vocabulary makes ~20% of ALL pairs qualify and the query
    # measures result materialization, not the join
    return J.ejoin(_docs(spark, sf_dir), similarity_threshold=0.95,
                   metric="cosine", tokenization="standard", round_to=6)


def q_topk_join(spark, sf_dir):
    return J.topk_join(_docs(spark, sf_dir), k=200, metric="cosine",
                       tokenization="standard", round_to=6)


def q_pe_topk_join(spark, sf_dir):
    out = J.pe_topk_join(_docs(spark, sf_dir), k=5, metric="cosine",
                         tokenization="standard", round_to=6)
    return out.select(F.col("eid").alias("doc_id"), "neighbor", "sim",
                      F.col("rank").cast("long").alias("rank"))


def q_lang_id(spark, sf_dir):
    return A.language_id(_docs(spark, sf_dir)).select(
        F.col("eid").alias("doc_id"), "lang_pred", "lang_score")


def q_quality_score(spark, sf_dir):
    out = A.quality_score(_docs(spark, sf_dir))
    return out.select(F.col("eid").alias("doc_id"),
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      "avg_token_len", "stopword_ratio", "unique_ratio",
                      "alpha_ratio", "quality_score")


def q_token_count(spark, sf_dir):
    out = A.token_count(_docs(spark, sf_dir))
    return out.select(F.col("eid").alias("doc_id"),
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      F.col("n_unique_tokens").cast("long").alias("n_unique_tokens"),
                      F.col("n_chars").cast("long").alias("n_chars"))


def q_line_dedup(spark, sf_dir):
    """RefinedWeb/C4-style cross-corpus exact line dedup. The testdata
    text is single-line, so multi-line docs are derived IDENTICALLY in
    engine and oracle: every literal ' the ' becomes a newline."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" the "), F.lit("\n")).alias("text"))
    return A.line_dedup(docs, min_count=2, keep_first=True).select(
        F.col("eid").alias("doc_id"),
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept").cast("long").alias("n_kept"),
        "clean_text")


def q_pii_counts(spark, sf_dir):
    """PII-shaped substring counts (emails / IPv4 / intl phones) — the
    scrubbing prefilter; engine-portable regex subset."""
    return A.pii_counts(_docs(spark, sf_dir)).select(
        F.col("eid").alias("doc_id"), "n_emails", "n_ipv4", "n_phoneish")


def q_gopher_quality(spark, sf_dir):
    """Gopher-rule document quality gates (word count, mean word
    length, symbol ratio, alpha-word fraction, stopword presence,
    bullet/ellipsis line fractions) + pass flag."""
    return A.gopher_quality(_docs(spark, sf_dir)).select(
        F.col("eid").alias("doc_id"), "n_words", "mean_word_len",
        "symbol_ratio", "alpha_word_frac", "n_stopwords",
        "bullet_line_frac", "ellipsis_line_frac", "passes")


def q_meta_factory_wnp(spark, sf_dir):
    """get_meta_blocking_approach acronym dispatch (the reference's
    config surface, comparison_cleaning.py:1088-1124) — WNP via the
    factory; shares weighted_node_pruning's oracle, so a factory
    routing bug shows up as a value mismatch."""
    p = BB.standard_blocking(_docs(spark, sf_dir))
    e = CC.get_meta_blocking_approach("WNP", p, scheme="CBS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_corpus_clean(spark, sf_dir):
    """The full four-stage cleaning pipeline (url dedup -> exact dedup
    -> Gopher gate -> MinHash-LSH near-dup + CC) with per-doc drop
    status — derived url column as in url_dedup."""
    from pyjedai_spark.pipeline import corpus_clean_pipeline
    docs = _docs(spark, sf_dir).select(
        "doc_id", "text",
        F.concat(
            F.lit("HTTPS://"), F.upper("source"),
            F.lit(".example.com:443/Crawl/"),
            (F.col("doc_id") % 50).cast("string"), F.lit("/"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("?utm_source=feed&b=2&a=1#frag"))
            .when(F.col("doc_id") % 3 == 1, F.lit("?a=1&b=2"))
            .otherwise(F.lit(""))).alias("url"))
    # explicitly uncapped: the DuckDB oracle enumerates every bucket, so
    # the registry surface must too (the production DEFAULT is capped)
    out = corpus_clean_pipeline(docs, url_col="url", max_bucket=None)
    return out.select(F.col("eid").alias("doc_id"), "status", "survivor")


def q_corpus_clean_tiered(spark, sf_dir):
    """corpus_clean with the tiered survivor policy end-to-end: every
    dedup stage (url groups, exact groups, near-dup clusters) keeps its
    highest-quality member (quality_score desc, tie min id) instead of
    the min id — and the copy that PROCEEDS downstream is the tiered
    survivor, so the quality-gate and near-dup stages see different
    rows than the min-id pipeline where it matters."""
    from pyjedai_spark.pipeline import corpus_clean_pipeline
    docs = _docs(spark, sf_dir).select(
        "doc_id", "text",
        F.concat(
            F.lit("HTTPS://"), F.upper("source"),
            F.lit(".example.com:443/Crawl/"),
            (F.col("doc_id") % 50).cast("string"), F.lit("/"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("?utm_source=feed&b=2&a=1#frag"))
            .when(F.col("doc_id") % 3 == 1, F.lit("?a=1&b=2"))
            .otherwise(F.lit(""))).alias("url"))
    rk = A.quality_score(docs).select(
        F.col("eid").alias("doc_id"), F.col("quality_score").alias("rank"))
    out = corpus_clean_pipeline(docs, url_col="url", max_bucket=None,
                                ranks=rk)
    return out.select(F.col("eid").alias("doc_id"), "status", "survivor")


def q_streaming_reconciled(spark, sf_dir):
    """Streaming incremental clean (3 arrival-ordered micro-batches
    through ``process_clean_increment``) followed by the periodic
    ``reconcile_clean_state`` batch job — the reconciled state must
    equal the BATCH ``corpus_clean_pipeline`` output exactly, so this
    query SHARES corpus_clean's DuckDB oracle (the hard proof that the
    streaming path's documented retroactive-merge delta is closed by
    reconciliation)."""
    import os as _os
    import tempfile

    from pyjedai_spark.streaming.incremental_clean import (
        process_clean_increment, reconcile_clean_state)

    docs = _docs(spark, sf_dir).select(
        "doc_id", "text",
        F.concat(
            F.lit("HTTPS://"), F.upper("source"),
            F.lit(".example.com:443/Crawl/"),
            (F.col("doc_id") % 50).cast("string"), F.lit("/"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("?utm_source=feed&b=2&a=1#frag"))
            .when(F.col("doc_id") % 3 == 1, F.lit("?a=1&b=2"))
            .otherwise(F.lit(""))).alias("url"))
    hi = docs.agg(F.max("doc_id")).first()[0] or 0
    b1, b2 = hi // 3, 2 * hi // 3
    tmp = tempfile.mkdtemp(prefix="pj_stream_rec_")
    state, outd = _os.path.join(tmp, "state"), _os.path.join(tmp, "out")
    batches = [docs.where(F.col("doc_id") <= b1),
               docs.where((F.col("doc_id") > b1) & (F.col("doc_id") <= b2)),
               docs.where(F.col("doc_id") > b2)]
    for i, b in enumerate(batches):
        process_clean_increment(b, state, outd, batch_id=i, url_col="url")
    rec = reconcile_clean_state(spark, state, outd)
    return rec.select(F.col("eid").alias("doc_id"), "status", "survivor")


def q_url_dedup(spark, sf_dir):
    """URL canonicalization + URL-keyed dedup. The testdata has no url
    column, so one is derived IDENTICALLY in engine and oracle from
    (source, doc_id): uppercase scheme/host + default port + tracking
    params + fragment variants that all canonicalize together."""
    from pyjedai_spark.functions import urls as U
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"), F.upper("source"),
            F.lit(".example.com:443/Crawl/"),
            (F.col("doc_id") % 50).cast("string"), F.lit("/"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("?utm_source=feed&b=2&a=1#frag"))
            .when(F.col("doc_id") % 3 == 1, F.lit("?a=1&b=2"))
            .otherwise(F.lit(""))).alias("url"))
    return U.url_dedup(docs).select(
        F.col("eid").alias("doc_id"), "url_canon", "survivor", "is_dup")


def q_repetition_stats(spark, sf_dir):
    """Gopher repetition signals (dup line/para fractions, top/dup
    n-gram char fractions). Testdata text is single-line, so multi-line
    docs are derived IDENTICALLY in engine and oracle: ' of ' becomes a
    paragraph break, then ' the ' a line break."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.replace(F.replace(F.col("text"), F.lit(" of "), F.lit("\n\n")),
                  F.lit(" the "), F.lit("\n")).alias("text"))
    return A.repetition_stats(docs).withColumnRenamed("eid", "doc_id")


def q_source_stats(spark, sf_dir):
    """Per-source corpus stats (doc count, exact-dup fraction, mean
    length) — the domain-blocklist signal of a crawl pipeline."""
    return A.source_stats(_docs(spark, sf_dir))


def q_events_windowed(spark, sf_dir):
    """Batch event-time tumbling windows over the events table (the
    batch twin of streaming/stateful.streaming_windowed_stats): per
    (1-hour window, event_type) count + value sum."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("win.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )


def q_schema_name_matches(spark, sf_dir):
    """Schema matching, name-based leg (ref schema/matching.py wraps
    Valentine; re-expressed as normalized-Levenshtein over the two
    column-name lists): customer vs supplier attributes."""
    from pyjedai_spark.schema_matching import name_based_matches

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return name_based_matches(c, s)


def q_schema_jaccard_leven(spark, sf_dir):
    """Schema matching, instance-based leg (Valentine's
    JaccardLevenMatcher semantics, length-banded value join): fuzzy
    value-overlap of customer vs supplier string columns."""
    from pyjedai_spark.schema_matching import jaccard_leven_matches

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return jaccard_leven_matches(c, s, threshold_leven=0.8)


def _schema_cluster_frames(spark, sf_dir):
    """Deterministic two-dataset fixture for schema clustering: the
    documents table split even/odd and re-projected under DIFFERENT
    column names with overlapping value domains (title/headline share a
    text-prefix vocabulary, site/domain the source labels, nchars/size
    the length integers; id/rid are disjoint). title/headline are
    nulled on a doc_id stripe to exercise the notna row-membership
    rule."""
    docs = _docs(spark, sf_dir)
    d1 = docs.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") % 7 != 0,
               F.substring("text", 1, 40)).alias("title"),
        F.substring("text", 1, 120).alias("body"),
        F.concat(F.lit("src"),
                 (F.floor(F.col("doc_id") / 2) % 10)).alias("site"),
        F.col("lang").alias("lang1"),
        F.col("n_chars").alias("nchars"))
    d2 = docs.where(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("rid"),
        F.when(F.col("doc_id") % 5 != 0,
               F.substring("text", 1, 40)).alias("headline"),
        F.substring("text", 1, 120).alias("content"),
        F.concat(F.lit("src"),
                 (F.floor(F.col("doc_id") / 2) % 10)).alias("domain"),
        F.col("lang").alias("lang2"),
        F.col("n_chars").alias("size"))
    return d1, d2


def q_schema_clustering(spark, sf_dir):
    """Attribute-level schema clustering (ref schema/clustering.py:146-
    211): value-mode attribute documents -> SB -> CCER purge(1.0) ->
    filter(0.8) -> EM cosine > 0.35 (the config the reference AUTHORS
    intended — their dict puts cosine/0.35 outside 'params' so the
    workflow silently falls back to dice/0.0; the module defaults to
    that effective config, this query exercises the intended one) ->
    2-element CC + the appended redundant cluster."""
    from pyjedai_spark.schema_clustering import schema_attribute_clusters

    d1, d2 = _schema_cluster_frames(spark, sf_dir)
    return schema_attribute_clusters(d1, d2, on="values", id_col="id",
                                     id_col2="rid", metric="cosine",
                                     similarity_threshold=0.35) \
        .withColumn("cluster_id", F.col("cluster_id").cast("long"))


def q_schema_clustered_er(spark, sf_dir):
    """Batched per-cluster ER (scale path of SchemaClustering.process,
    ref clustering.py:255-273): cluster-scoped standard blocking (key =
    cluster_id x token, both sides required), EM cosine > 0.35,
    per-cluster 2-element connected components -> cross-side pairs."""
    from pyjedai_spark.schema_clustering import (schema_attribute_clusters,
                                                 schema_clustered_er)

    d1, d2 = _schema_cluster_frames(spark, sf_dir)
    clusters = schema_attribute_clusters(d1, d2, on="values", id_col="id",
                                         id_col2="rid", metric="cosine",
                                         similarity_threshold=0.35) \
        .localCheckpoint()  # feeds membership twice + the pair decode
    docs1 = d1.select(
        "id",
        F.concat_ws(" ", F.coalesce("title", F.lit("")), "site",
                    F.col("nchars").cast("string")).alias("text"))
    docs2 = d2.select(
        "rid",
        F.concat_ws(" ", F.coalesce("headline", F.lit("")), "domain",
                    F.col("size").cast("string")).alias("text"))
    # 0.7: sparse-match regime — CCER CC keeps only 2-element
    # components, so a dense match graph (default 0.35 on this
    # near-dup-heavy corpus) drops every component; the higher fixture
    # threshold leaves unambiguous 1-1 matches to cluster
    return schema_clustered_er(d1, d2, clusters, docs1, docs2,
                               id_col="id", id_col2="rid",
                               similarity_threshold=0.7)


def _rdf_frames(spark, sf_dir, max_doc: int = 120):
    """Deterministic RDF triple fixture: the schema-clustering frames
    melted to (subject, predicate, object, tid). Predicates are
    disjoint between sides EXCEPT ``p_lang``, shared on purpose to pin
    the reference's merged-predicate semantics (one predicate document
    accumulating d1's objects before d2's, in_d1 = in_d2 = 1). Null
    titles/headlines drop their triple (the reference's ``' ' + object``
    would TypeError on NaN). ``max_doc`` caps the corpus so the
    subject-ER oracle's sequential-UMC recursion stays tractable."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < max_doc)
    s = F.concat(F.lit("s"), F.col("doc_id"))

    def melt(side_docs, specs, off):
        outs = []
        for i, (pred, obj, cond) in enumerate(specs):
            t = side_docs.select(
                s.alias("subject"), F.lit(pred).alias("predicate"),
                obj.cast("string").alias("object"),
                (F.col("doc_id") * len(specs) + i + off).alias("tid"))
            outs.append(t.where(cond) if cond is not None else t)
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out

    even = docs.where(F.col("doc_id") % 2 == 0)
    odd = docs.where(F.col("doc_id") % 2 == 1)
    t1 = melt(even, [
        ("p_title", F.substring("text", 1, 40), F.col("doc_id") % 7 != 0),
        ("p_body", F.substring("text", 1, 120), None),
        ("p_site", F.concat(F.lit("src"),
                            (F.floor(F.col("doc_id") / 2) % 10)), None),
        ("p_lang", F.col("lang"), None),
        ("p_nchars", F.col("n_chars"), None),
    ], 0)
    t2 = melt(odd, [
        ("q_headline", F.substring("text", 1, 40), F.col("doc_id") % 5 != 0),
        ("q_content", F.substring("text", 1, 120), None),
        ("q_domain", F.concat(F.lit("src"),
                              (F.floor(F.col("doc_id") / 2) % 10)), None),
        ("p_lang", F.col("lang"), None),
        ("q_size", F.col("n_chars"), None),
    ], 0)
    return t1, t2


def q_rdf_predicate_docs(spark, sf_dir):
    """Per-predicate documents (ref RDFSchemaClustering.process,
    schema/clustering.py:388-418): objects concatenated d1-then-d2 in
    row order, insertion-order aid, per-side membership flags."""
    from pyjedai_spark.schema_clustering import rdf_predicate_entities

    t1, t2 = _rdf_frames(spark, sf_dir)
    return rdf_predicate_entities(t1, t2).select(
        "aid", "predicate", "text",
        F.col("in_d1").cast("long").alias("in_d1"),
        F.col("in_d2").cast("long").alias("in_d2"))


def q_rdf_predicate_clusters(spark, sf_dir):
    """Predicate clustering via the reference's default dirty-ER
    workflow (pyjedai_workflow_for_er_on_predicates, schema/clustering
    .py:625-640): SB -> purge(1.0) -> filter(0.8) -> WNP(CBS) -> EM
    cosine > 0 -> connected components + the appended redundant
    cluster (-1)."""
    from pyjedai_spark.schema_clustering import (rdf_predicate_clusters,
                                                 rdf_predicate_entities)

    t1, t2 = _rdf_frames(spark, sf_dir)
    preds = rdf_predicate_entities(t1, t2)
    return rdf_predicate_clusters(preds).select(
        "cluster_id", "aid", "predicate",
        F.col("in_d1").cast("long").alias("in_d1"),
        F.col("in_d2").cast("long").alias("in_d2"))


def q_rdf_subject_er(spark, sf_dir):
    """Batched per-cluster subject resolution (ref RDFSchemaClustering
    .process main loop + pyjedai_workflow_for_er_on_subjects,
    schema/clustering.py:406-624): subject documents per qualifying
    predicate cluster -> cluster-scoped SB -> BlockFiltering(0.2) ->
    WNP(CBS) -> tfidf char-3gram cosine > 0 -> distributed greedy 1-1
    matching (> 0.1) -> cross-side subject pairs."""
    from pyjedai_spark.schema_clustering import (rdf_predicate_clusters,
                                                 rdf_predicate_entities,
                                                 rdf_subject_er)

    t1, t2 = _rdf_frames(spark, sf_dir)
    preds = rdf_predicate_entities(t1, t2)
    clusters = rdf_predicate_clusters(preds).localCheckpoint()
    return rdf_subject_er(t1, t2, clusters)


def _spatial_frames(spark, sf_dir):
    """Deterministic envelope tables derived from customer (source) and
    supplier (target) keys — integer-valued doubles, so every grid/area
    computation is exact and the DuckDB oracle reproduces it bit-for-bit
    (no external geo data; envelopes are what the equigrid + MBR
    algebra consumes)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    k = F.col("c_custkey")
    src = c.select(
        k.alias("id"),
        ((k * 37) % 997).cast("double").alias("minx"),
        ((k * 59) % 983).cast("double").alias("miny"),
        (((k * 37) % 997) + 1 + (k % 19)).cast("double").alias("maxx"),
        (((k * 59) % 983) + 1 + (k % 13)).cast("double").alias("maxy"))
    j = F.col("s_suppkey")
    tgt = s.select(
        j.alias("id"),
        ((j * 41) % 997).cast("double").alias("minx"),
        ((j * 67) % 983).cast("double").alias("miny"),
        (((j * 41) % 997) + 1 + (j % 23)).cast("double").alias("maxx"),
        (((j * 67) % 983) + 1 + (j % 17)).cast("double").alias("maxy"))
    return src, tgt


def q_spatial_equigrid_cf(spark, sf_dir):
    """Spatial ER filtering (ref spatial/filtering.py equigrid +
    initialization.py CF weights): co-occurring-cell candidates with
    envelope-intersection validity."""
    from pyjedai_spark.operators.spatial import equigrid_candidates

    src, tgt = _spatial_frames(spark, sf_dir)
    return equigrid_candidates(src, tgt, "CF")


def q_spatial_equigrid_js(spark, sf_dir):
    """JS_APPROX weighting — exercises the reference's +1 block-count
    quirk (getNoOfBlocks counts inclusive bounds while cell indexing is
    range-exclusive)."""
    from pyjedai_spark.operators.spatial import equigrid_candidates

    src, tgt = _spatial_frames(spark, sf_dir)
    return equigrid_candidates(src, tgt, "JS_APPROX")


def q_spatial_topk_mbr(spark, sf_dir):
    """Budgeted spatial init (ref initialization.py PQ): global top-200
    pairs by MBR overlap weight."""
    from pyjedai_spark.operators.spatial import spatial_topk

    src, tgt = _spatial_frames(spark, sf_dir)
    return spatial_topk(src, tgt, budget=200, w_scheme="MBR")


def _spatial_classified(spark, sf_dir):
    from pyjedai_spark.operators.spatial import (de9im_relations,
                                                 envelope_de9im,
                                                 equigrid_candidates)

    src, tgt = _spatial_frames(spark, sf_dir)
    cand = equigrid_candidates(src, tgt, "CF", require_intersection=False,
                               keep_envelopes=True)
    return de9im_relations(envelope_de9im(cand))


def q_spatial_relations(spark, sf_dir):
    """DE-9IM relation classification (ref spatial/verification.py
    verifyRelations): exact rectangle relate matrices + the reference's
    Pattern/AntiPattern/NOrPattern named relations as int flags —
    validity filter OFF so the disjoint/touch branches are exercised."""
    rel = _spatial_classified(spark, sf_dir)
    return rel.select(
        "source_id", "target_id", "de9im", "intersects", "contains",
        "within", "covered_by", "covers", "crosses", "equals", "overlaps",
        "touches", "detected_links", "related")


def q_spatial_relation_stats(spark, sf_dir):
    """RelatedGeometries counters (ref verification.py:88-181): one
    aggregate row of verified/linked/interlinked + per-relation
    counts."""
    from pyjedai_spark.operators.spatial import related_geometries_stats

    return related_geometries_stats(_spatial_classified(spark, sf_dir))


_EMB_DIM = 64  # testdata embeddings are 64-dim at every SF (TESTDATA.md)


def q_ann_topk(spark, sf_dir):
    """DEFAULT ANN path: banded 16-bit sign-LSH candidates + exact
    cosine rerank (the 100 TB plan — never a cartesian product)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = V.lsh_topk(emb, k=10, dim=_EMB_DIM)
    return out.select("query_id", "neighbor_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


def q_ann_lsh_topk(spark, sf_dir):
    """Same family at a recall/cost trade-off (2 bands x 12 bits)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = V.lsh_topk(emb, k=10, n_bands=2, band_bits=12, dim=_EMB_DIM)
    return out.select("query_id", "neighbor_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


def q_ann_topk_from_text(spark, sf_dir):
    """End-to-end TEXT ANN: deterministic hashing-trick char-3gram
    encoder (functions/vectors.hashing_trick_embedding — replaces the
    reference's external gensim/BERT encoders,
    vector_based_blocking.py:61-504) feeding the banded sign-LSH top-k.
    No precomputed embeddings table involved."""
    emb = V.hashing_trick_embedding(_docs(spark, sf_dir), dim=_EMB_DIM)
    out = V.lsh_topk(emb, k=10, dim=_EMB_DIM)
    return out.select("query_id", "neighbor_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-flat ANN (coarse quantizer + exact in-cell rerank): the
    classic FAISS-style scale path complementing sign-LSH. Centroid
    table is tiny and broadcast; assignment is N x n_cells, rerank
    ~nprobe/n_cells of the corpus per query."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = V.ivf_topk(emb, k=10, n_cells=16, nprobe=2)
    return out.select("query_id", "neighbor_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


def q_ann_brute_topk(spark, sf_dir):
    """Exactness baseline: bounded 20-probe broadcast brute force (the
    probe side MUST be bounded; lsh_topk is the unbounded-N path)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = V.brute_force_topk(emb, k=10, probe_ids=list(range(20)))
    return out.select("query_id", "neighbor_id", "cosine",
                      F.col("rank").cast("long").alias("rank"))


def q_embedding_dedup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return V.embedding_cosine_dedup(emb, threshold=0.42, dim=_EMB_DIM)


# ------- no-oracle (rows-only) queries: non-SQL-expressible surfaces

def q_webtext_minhash_clusters(spark, sf_dir):
    """Common-Crawl-shaped webtext (url/warc_ts/html/text/lang) through
    the full pipeline INCLUDING the html->text Arrow pandas UDF: the
    documents table is wrapped into html bytes, extraction recovers the
    text byte-identically (the north-rule per-url invariant; testdata
    text is whitespace-collapsed, so strip-tags+collapse is lossless),
    then MinHash-LSH -> jaccard verify -> connected components. The
    oracle replays the same chain from documents.text directly — it
    matches ONLY if extraction is in fact byte-identical."""
    from .datamodel import extract_text_udf
    from .pipeline import minhash_dedup_pipeline

    docs = _docs(spark, sf_dir)
    web = docs.select(
        F.col("doc_id").alias("eid"),
        F.concat(F.lit("http://corpus.example/"), F.col("doc_id")).alias("url"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><head><title>d</title></head><body><p>"),
                     F.col("text"),
                     F.lit("</p></body></html>")), "utf-8").alias("html"),
        F.lit("en").alias("lang"),
    )
    web = web.withColumn("text", extract_text_udf(F.col("html")))
    return minhash_dedup_pipeline(web, id_col="eid", shingle_size=3,
                                  jaccard_threshold=0.5)


def _ccer_inputs(spark, sf_dir):
    """Two clean datasets from one corpus: even/odd doc_id split
    (deterministic, SQL-expressible; ids disjoint by construction)."""
    docs = _docs(spark, sf_dir)
    return docs.where(F.col("doc_id") % 2 == 0), \
        docs.where(F.col("doc_id") % 2 == 1)


def q_ccer_blocks(spark, sf_dir):
    from .operators import ccer as X

    d1, d2 = _ccer_inputs(spark, sf_dir)
    p = X.ccer_blocking(d1, d2)
    return p.groupBy("key").agg(
        F.sum((F.col("side") == 1).cast("long")).alias("n1"),
        F.sum((F.col("side") == 2).cast("long")).alias("n2"))


def q_ccer_pairs_cp(spark, sf_dir):
    from .operators import ccer as X

    d1, d2 = _ccer_inputs(spark, sf_dir)
    return X.ccer_pairs(X.ccer_blocking(d1, d2))


def q_ccer_wep_js(spark, sf_dir):
    from .operators import ccer as X

    d1, d2 = _ccer_inputs(spark, sf_dir)
    e = X.ccer_wep(X.ccer_blocking(d1, d2), "JS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def _ccer_postings(spark, sf_dir):
    from .operators import ccer as X

    d1, d2 = _ccer_inputs(spark, sf_dir)
    return X, X.ccer_blocking(d1, d2)


def q_ccer_wep_ejs(spark, sf_dir):
    """The reference's best published CCER configuration: WEP with the
    EJS scheme on the true D1 x D2 graph (workflow.py:696-716)."""
    X, p = _ccer_postings(spark, sf_dir)
    e = X.ccer_wep(p, "EJS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_ccer_wep_x2(spark, sf_dir):
    X, p = _ccer_postings(spark, sf_dir)
    e = X.ccer_wep(p, "X2")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_ccer_cnp_js(spark, sf_dir):
    X, p = _ccer_postings(spark, sf_dir)
    e = X.ccer_cnp(p, "JS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_ccer_rcnp_cncbs(spark, sf_dir):
    """Reciprocal CNP with the reference's default CN-CBS scheme
    (incl. the dangling-else counter quirk) on the CCER graph."""
    X, p = _ccer_postings(spark, sf_dir)
    e = X.ccer_cnp(p, "CN-CBS", reciprocal=True)
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_ccer_cep_js(spark, sf_dir):
    X, p = _ccer_postings(spark, sf_dir)
    e = X.ccer_cep(p, "JS")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_ccer_blast_x2(spark, sf_dir):
    X, p = _ccer_postings(spark, sf_dir)
    e = X.ccer_blast(p, "X2")
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_ccer_best_chain(spark, sf_dir):
    """The reference's best-CCER recipe END TO END on the true D1 x D2
    space (workflow.py:696-716): StandardBlocking -> BlockFiltering(0.9,
    CCER validity) -> WEP(EJS) -> char-3gram tfidf cosine -> UMC(0.17).
    Pair space thinned 8x (id1 % 8 = 0) between pruning and matching so
    the oracle's sequential UMC recursion stays tractable — every stage
    formula is still the flagship config's."""
    from .operators import block_cleaning as BCL
    from .operators import ccer as X

    d1, d2 = _ccer_inputs(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    p = BCL.block_filtering(X.ccer_blocking(d1, d2), ratio=0.9,
                            dirty=False).localCheckpoint()
    pairs = X.ccer_wep(p, "EJS").select("id1", "id2")
    pairs = pairs.where(F.col("id1") % 8 == 0).localCheckpoint()
    m = M.tfidf_cosine_matching(pairs, docs, tokenizer="char", qgram=3,
                                similarity_threshold=0.0, round_to=6)
    return CL.unique_mapping_clustering(m, similarity_threshold=0.17,
                                        weight_col="sim")


def _ccer_matches(spark, sf_dir):
    from .operators import ccer as X

    d1, d2 = _ccer_inputs(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    cands = X.ccer_wep(X.ccer_blocking(d1, d2), "JS").select("id1", "id2")
    cands = cands.localCheckpoint()
    return M.entity_matching(cands, docs, metric="cosine",
                             similarity_threshold=0.55, round_to=6)


def q_ccer_em_cosine(spark, sf_dir):
    return _ccer_matches(spark, sf_dir)


def q_ccer_ccc(spark, sf_dir):
    from .operators import ccer as X

    m = _ccer_matches(spark, sf_dir)
    return X.ccc_size2(m.select("id1", "id2")).select(
        F.col("eid").alias("doc_id"), "cluster_id")


def q_embeddings_nn_bpm(spark, sf_dir):
    """EmbeddingsNNBPM (prioritization.py:622-841): ANN top-k
    neighborhoods -> budgeted HB emission. ANN = brute-force cosine over
    the probe set (the FAISS IndexFlat equivalent); emission orders per
    DatasetScheduler."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nn = V.brute_force_topk(emb, k=10, probe_ids=list(range(20)))
    edges = nn.select(F.col("query_id").alias("id1"),
                      F.col("neighbor_id").alias("id2"),
                      F.col("cosine").alias("weight"))
    return PR.emit(edges, budget=100, method="HB").select(
        "id1", "id2", F.round("weight", 6).alias("weight"),
        F.col("emit_rank").cast("long").alias("emit_rank"))


def q_topk_join_pm(spark, sf_dir):
    """TopKJoinPM (prioritization.py:1149-1349): PETopKJoin
    neighborhoods emitted progressively (TOP order)."""
    nn = J.pe_topk_join(_docs(spark, sf_dir), k=5, metric="cosine",
                        tokenization="standard", round_to=6)
    edges = nn.select(F.col("eid").alias("id1"),
                      F.col("neighbor").alias("id2"),
                      F.col("sim").alias("weight"))
    return PR.emit(edges, budget=200, method="TOP").select(
        "id1", "id2", F.round("weight", 6).alias("weight"),
        F.col("emit_rank").cast("long").alias("emit_rank"))


def _dirty_matches(spark, sf_dir):
    docs, cands = _cnp_cands(spark, sf_dir)
    return M.entity_matching(cands, docs, metric="cosine",
                             similarity_threshold=0.55,
                             round_to=6).localCheckpoint()


def _component_stats(out, m, check_refinement=True):
    """Deterministic projection of an order/float-dependent clusterer
    for the driver oracle (r4 verdict item 7): per connected component
    of the thresholded match graph — docs assigned (partition property:
    must equal the component size), assignment rows (no duplicate
    assignments), and with ``check_refinement`` the count of clusters
    leaking across components (always 0 for cut/ricochet/markov, whose
    moves only ever follow edges). These hold for ANY correct run
    regardless of pivot/iteration order, so a DuckDB recursive-CTE CC
    reproduces them exactly; the cluster ASSIGNMENTS themselves stay
    order-dependent and are pinned by pytest toy tests instead. A node
    the clusterer invents (absent from the graph) lands in comp_id -1
    and mismatches; a dropped node shrinks n_docs and mismatches.

    ``check_refinement=False`` for CorrelationClustering: its objective
    scores NON-edges (sim 0 < non_similarity_threshold) as dissimilar,
    so evicting a weakly-attached node from its component's cluster
    into a foreign cluster can strictly improve the objective —
    cross-component clusters are legitimate outputs of the reference's
    move semantics, not a defect (found BY this check at sf0.01)."""
    comp = CL.connected_components(m.select("id1", "id2")).select(
        F.col("eid").alias("doc_id"), F.col("cluster_id").alias("comp_id"))
    j = out.join(comp, "doc_id", "left").withColumn(
        "comp_id", F.coalesce("comp_id", F.lit(-1)))
    stats = j.groupBy("comp_id").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_rows"))
    if not check_refinement:
        return stats
    span = (j.groupBy("cluster_id")
            .agg(F.countDistinct("comp_id").alias("_nc"),
                 F.min("comp_id").alias("comp_id"))
            .where(F.col("_nc") > 1)
            .groupBy("comp_id").agg(F.count("*").alias("_sp")))
    return (stats.join(span, "comp_id", "left")
            .select("comp_id", "n_docs", "n_rows",
                    F.coalesce(F.col("_sp"), F.lit(0)).cast("long")
                    .alias("spanning_clusters")))


def q_cut_clustering(spark, sf_dir):
    m = _dirty_matches(spark, sf_dir).where(F.col("sim") > 0.9)
    out = CL.cut_clustering(m, similarity_threshold=0.55).select(
        F.col("eid").alias("doc_id"), "cluster_id")
    return _component_stats(out, m)


def q_correlation_clustering(spark, sf_dir):
    # > 0.9: sparser graph -> multiple components, so the invariant
    # projection has real multi-row grain at the driver's gate scale
    m = _dirty_matches(spark, sf_dir).where(F.col("sim") > 0.9)
    out = CL.correlation_clustering(m).select(
        F.col("eid").alias("doc_id"), "cluster_id")
    return _component_stats(out, m, check_refinement=False)


def q_ricochet_clustering(spark, sf_dir):
    m = _dirty_matches(spark, sf_dir).where(F.col("sim") > 0.9)
    out = CL.ricochet_sr_clustering(m, similarity_threshold=0.55).select(
        F.col("eid").alias("doc_id"), "cluster_id")
    return _component_stats(out, m)


def q_kiraly_clustering(spark, sf_dir):
    m = _ccer_matches(spark, sf_dir)
    side1 = _docs(spark, sf_dir).where("doc_id % 2 = 0").select("doc_id")
    return CL.kiraly_msm_clustering(m, side1, similarity_threshold=0.55)


def q_row_column_clustering(spark, sf_dir):
    m = _ccer_matches(spark, sf_dir)
    side1 = _docs(spark, sf_dir).where("doc_id % 2 = 0").select("doc_id")
    return CL.row_column_clustering(m, side1, similarity_threshold=0.55)


def q_markov_clustering(spark, sf_dir):
    """MCL over the der-chain match graph (rows-only: iterated float
    matrix algebra is not stably SQL-expressible across engines)."""
    docs, cands = _cnp_cands(spark, sf_dir)
    m = M.entity_matching(cands, docs, metric="cosine",
                          similarity_threshold=0.55, round_to=6)
    # prune_below: the standard MCL sparsity guard — near-zero entries
    # cannot survive the 0.001 cluster threshold but quadratically
    # inflate the matmul; pruning keeps the iterate sparse (the at-scale
    # configuration; documented delta from the reference's dense float
    # matrix, which this rows-only check does not hash against)
    m = m.where(F.col("sim") > 0.9).localCheckpoint()
    out = CL.markov_clustering(m, similarity_threshold=0.55,
                               prune_below=1e-6)
    return _component_stats(
        out.select(F.col("eid").alias("doc_id"), "cluster_id"), m)


def q_ccer_unique_mapping(spark, sf_dir):
    """CCER UMC. Edge set thinned 8x (id1 % 8 = 0) so the oracle's
    sequential recursive-CTE greedy stays tractable."""
    m = _ccer_matches(spark, sf_dir).where(F.col("id1") % 8 == 0)
    return CL.unique_mapping_clustering(m, similarity_threshold=0.55,
                                        weight_col="sim")


def q_media_features(spark, sf_dir):
    """Multimodal: binary payload -> 64-dim content feature (Arrow
    pandas UDF; deterministic synthetic media, no external data).

    Registry surface projects the array<float> embedding to a hashable
    digest + scalar stats: the driver's canonicalizer (pandas factorize)
    cannot hash list cells, and the raw vectors stay available through
    ``multimodal.media_features`` itself (pixel-exact tests pin them)."""
    from . import multimodal as MM

    feats = MM.media_features(MM.synth_media(spark, 60))
    rounded = F.transform("embedding",
                          lambda x: F.round(x.cast("double"), 5))
    return feats.select(
        "media_id", "kind",
        F.size("embedding").alias("emb_dim"),
        F.md5(F.concat_ws(",", F.transform(rounded,
                                           lambda x: x.cast("string"))))
        .alias("emb_md5"),
        F.round(F.aggregate(rounded, F.lit(0.0),
                            lambda acc, x: acc + x * x), 4).alias("emb_sq"))


def q_video_frame_sample(spark, sf_dir):
    """Multimodal: 1->N frame sampling via mapInPandas."""
    from . import multimodal as MM

    return MM.frame_sample(MM.synth_media(spark, 60), every_ms=500,
                           max_frames=8)


def q_audio_decode(spark, sf_dir):
    """Multimodal: PCM WAV payloads decode for real (pure RIFF parse);
    exact integer-derived RMS / zero-crossing features."""
    from . import multimodal as MM

    return MM.decode_audio(MM.synth_media(spark, 60))


def q_unique_mapping(spark, sf_dir):
    """UMC greedy 1-1 matching. Pair set thinned 8x (id1 % 8 = 0) so the
    DuckDB oracle's sequential recursive-CTE scan stays tractable."""
    docs = _docs(spark, sf_dir)
    p = BB.standard_blocking(docs)
    cands = CC.cardinality_node_pruning(p, "JS", num_entities=docs.count())
    cands = cands.where(F.col("id1") % 8 == 0)
    m = M.entity_matching(cands.select("id1", "id2"), docs, metric="cosine",
                          similarity_threshold=0.55, round_to=6)
    return CL.unique_mapping_clustering(m, similarity_threshold=0.55,
                                        weight_col="sim")


def q_unique_mapping_dist(spark, sf_dir):
    """Distributed UMC (iterated locally-dominant matching) on the SAME
    input as `unique_mapping` — and the same oracle: the two algorithms
    are provably output-identical, and the shared DuckDB greedy-scan
    replica proves it per round."""
    docs = _docs(spark, sf_dir)
    p = BB.standard_blocking(docs)
    cands = CC.cardinality_node_pruning(p, "JS", num_entities=docs.count())
    cands = cands.where(F.col("id1") % 8 == 0)
    m = M.entity_matching(cands.select("id1", "id2"), docs, metric="cosine",
                          similarity_threshold=0.55, round_to=6)
    return CL.unique_mapping_distributed(m, similarity_threshold=0.55,
                                         weight_col="sim")


def q_qgrams_blocking(spark, sf_dir):
    p = BB.qgrams_blocking(_docs(spark, sf_dir), q=4)
    return p.groupBy(F.col("key")).agg(F.count("*").alias("block_size"))


def q_suffix_blocking(spark, sf_dir):
    p = BB.suffix_arrays_blocking(_docs(spark, sf_dir), suffix_length=4,
                                  max_block_size=53)
    return p.groupBy(F.col("key")).agg(F.count("*").alias("block_size"))


def q_ext_suffix_blocking(spark, sf_dir):
    p = BB.extended_suffix_arrays_blocking(_docs(spark, sf_dir),
                                           suffix_length=4, max_block_size=39)
    return p.groupBy(F.col("key")).agg(F.count("*").alias("block_size"))


def q_ext_qgrams_blocking(spark, sf_dir):
    p = BB.extended_qgrams_blocking(_docs(spark, sf_dir), q=4, threshold=0.95)
    return p.groupBy(F.col("key")).agg(F.count("*").alias("block_size"))


def q_gpsn_acf(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    return SN.global_psn(p, window=3, scheme="ACF")


def q_gpsn_id(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    return SN.global_psn(p, window=3, scheme="ID")


def q_lpsn_ncf(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    return SN.local_psn(p, window=3, scheme="NCF")


def q_pcep_topk(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    out = PR.global_top_pm(p, budget=500, scheme="JS")
    return out.select("id1", "id2", F.round("weight", 6).alias("weight"),
                      F.col("emit_rank").cast("long").alias("emit_rank"))


def q_pcnp_dfs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    p = BB.standard_blocking(docs)
    out = PR.local_top_pm(p, budget=500, scheme="CBS")
    return out.select("id1", "id2", F.round("weight", 6).alias("weight"),
                      F.col("emit_rank").cast("long").alias("emit_rank"))


def q_random_pm(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    out = PR.random_pm(p, budget=200)
    return out.select("id1", "id2",
                      F.col("emit_rank").cast("long").alias("emit_rank"))


def q_pes_hb(spark, sf_dir):
    p = BB.standard_blocking(_docs(spark, sf_dir))
    out = PR.pes(p, budget=300, scheme="CBS", method="HB")
    return out.select("id1", "id2", F.round("weight", 6).alias("weight"),
                      F.col("emit_rank").cast("long").alias("emit_rank"))


def _progressive_gt(docs):
    """Ground-truth near-dup pairs: exact 3-shingle Jaccard >= 0.5
    (SQL-expressible; the same GT the LSH recall eval uses)."""
    return DD.ngram_jaccard_pairs(docs, n=3, threshold=0.5).select("id1", "id2")


def q_progressive_recall(spark, sf_dir):
    """Cumulative recall per emission of the PES(HB) schedule against
    near-dup ground truth (reference evaluation.py:298-368)."""
    from . import evaluation as EV

    docs = _docs(spark, sf_dir)
    p = BB.standard_blocking(docs)
    emitted = PR.pes(p, budget=300, scheme="CBS", method="HB")
    curve = EV.progressive_recall_curve(emitted, _progressive_gt(docs))
    return curve.select(F.col("emit_rank").cast("long").alias("emit_rank"),
                        F.col("cum_tps").cast("long").alias("cum_tps"),
                        "cum_recall")


def q_progressive_auc(spark, sf_dir):
    """Normalized AUC of the cumulative-recall curve — the headline
    progressive-ER metric (evaluation.py:360-368)."""
    from . import evaluation as EV

    docs = _docs(spark, sf_dir)
    p = BB.standard_blocking(docs)
    emitted = PR.pes(p, budget=300, scheme="CBS", method="HB")
    out = EV.progressive_auc(emitted, _progressive_gt(docs))
    return out.select(F.col("total_emissions").cast("long").alias("total_emissions"),
                      F.col("tps_found").cast("long").alias("tps_found"),
                      "auc")


def _cnp_cands(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    p = BB.standard_blocking(docs)
    return docs, CC.cardinality_node_pruning(
        p, "JS", num_entities=docs.count()).select("id1", "id2")


def q_meta_cnp_cleaned(spark, sf_dir):
    """Meta-blocking the way it runs in production: AFTER block purging
    + filtering (the reference DER chain order, workflow.py:718-735).
    Standalone CNP on raw webtext blocks is quadratic in the hot-token
    mega-blocks; cleaning first is the scale path."""
    docs = _docs(spark, sf_dir)
    # fused purge+filter (clean_blocks): tokenize + cardinality-agg run
    # once instead of the naive chain's 2x/3x
    p = BC.clean_blocks(BB.standard_blocking(docs), smoothing_factor=1.0,
                        ratio=0.8, keep_size=True)
    # stage barrier: CNP references its input 4x; see checkpoint.stage
    p = p.localCheckpoint()
    e = CC.cardinality_node_pruning(p, "JS", num_entities=docs.count())
    return e.select("id1", "id2", F.round("weight", 6).alias("weight"))


def q_em_dice(spark, sf_dir):
    docs, cands = _cnp_cands(spark, sf_dir)
    return M.entity_matching(cands, docs, metric="dice",
                             similarity_threshold=0.4, round_to=6)


def q_em_generalized_jaccard(spark, sf_dir):
    """GeneralizedJaccard (string_matchers.py:92-140): Jaro-matched soft
    token overlap, greedy best-score assignment. Pair set thinned 40x
    (id1 % 40 = 0) and text truncated to a 60-char prefix to bound the
    O(|A|*|B|) Jaro cross-products and the greedy recursion depth in the
    DuckDB oracle's recursive-CTE replica (same semantics, small sets)."""
    docs, cands = _cnp_cands(spark, sf_dir)
    cands = cands.where(F.col("id1") % 40 == 0)
    docs = docs.withColumn("text", F.substring("text", 1, 60))
    return M.entity_matching(cands, docs, metric="generalized_jaccard",
                             similarity_threshold=0.3, round_to=6)


def q_em_jaccard_quirk(spark, sf_dir):
    docs, cands = _cnp_cands(spark, sf_dir)
    return M.entity_matching(cands, docs, metric="jaccard",
                             similarity_threshold=0.2, round_to=6)


def q_em_overlap(spark, sf_dir):
    docs, cands = _cnp_cands(spark, sf_dir)
    return M.entity_matching(cands, docs, metric="overlap_coefficient",
                             similarity_threshold=0.5, round_to=6)


def q_em_levenshtein(spark, sf_dir):
    docs, cands = _cnp_cands(spark, sf_dir)
    # round BEFORE the threshold (entity_matching rounds first when
    # round_to is set) so the retained set matches the oracle's
    # round-then-filter exactly
    return M.entity_matching(cands, docs, metric="levenshtein",
                             similarity_threshold=0.3, round_to=6)


def q_em_jaro(spark, sf_dir):
    docs, cands = _cnp_cands(spark, sf_dir)
    return M.entity_matching(cands, docs, metric="jaro",
                             similarity_threshold=0.5, round_to=6)


def q_tfidf_cosine(spark, sf_dir):
    docs, cands = _cnp_cands(spark, sf_dir)
    return M.tfidf_cosine_matching(cands, docs, tokenizer="word",
                                   similarity_threshold=0.3, round_to=6)


def q_tf_cosine(spark, sf_dir):
    docs, cands = _cnp_cands(spark, sf_dir)
    return M.tfidf_cosine_matching(cands, docs, tokenizer="word",
                                   similarity_threshold=0.3, round_to=6,
                                   vectorizer="tf")


def q_boolean_cosine(spark, sf_dir):
    docs, cands = _cnp_cands(spark, sf_dir)
    return M.tfidf_cosine_matching(cands, docs, tokenizer="word",
                                   similarity_threshold=0.3, round_to=6,
                                   vectorizer="boolean")


def q_clean_text(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", TXT.clean_text(F.col("text")).alias("cleaned"))


def q_lsh_recall_eval(spark, sf_dir):
    """Evaluation operator (evaluation.py:54-79): precision/recall/F1 of
    the MinHash-LSH candidate set against exact 3-shingle Jaccard>=0.5
    ground truth — semi-join counting, no pair loop."""
    docs = _docs(spark, sf_dir)
    pred = DD.lsh_candidate_pairs(docs, k=32, bands=8, shingle_size=3,
                                  max_bucket=None)
    gt = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.5).select("id1", "id2")
    tp = pred.join(gt, ["id1", "id2"], "left_semi").count()
    np_, ng = pred.count(), gt.count()
    prec = tp / np_ if np_ else 0.0
    rec = tp / ng if ng else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return spark.createDataFrame(
        [(tp, np_ - tp, ng - tp, round(prec, 6), round(rec, 6), round(f1, 6))],
        "tp long, fp long, fn long, prec double, recall double, f1 double")


def q_workflow_report(spark, sf_dir):
    """Driver-checkable surface for ``workflow_report()`` — the
    visualization-replacement metrics export (ref visualization.py:9-31
    confusion-heatmap numbers + workflow to_df bars): the reference
    best-DER workflow (ref workflow.py:718-735) runs end-to-end against
    a SQL-replicable ground truth (exact 3-shingle Jaccard >= 0.5 via
    the token-join pattern, no pair loop) and one row per stage carries
    the surviving-row + confusion counts the reference plots. The
    report's wall-clock columns are non-deterministic and dropped here;
    precision/recall/f1 are recomputed from the integer confusion
    counts with Spark round() so the DuckDB oracle is bit-exact."""
    from .workflow import BlockingBasedWorkFlow

    docs = _docs(spark, sf_dir)
    gt = (DD.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
          .select("id1", "id2").localCheckpoint())
    wf = BlockingBasedWorkFlow.best_der()
    wf.run(docs, gt=gt)
    rows = [(wf.name, i + 1, s["stage"], int(s["rows"]), int(s["tp"]),
             int(s["fp"]), int(s["fn"])) for i, s in enumerate(wf.steps)]
    out = spark.createDataFrame(
        rows, "workflow string, stage_idx long, stage string, n_rows long, "
              "tp long, fp long, fn long")
    out = out.withColumn(
        "tn", (F.lit(int(wf.total_comparisons)) - F.col("tp") - F.col("fp")
               - F.col("fn")).cast("long"))
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    f1 = F.when(F.col("tp") > 0,
                2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return (out.withColumn("precision", F.round(prec, 6))
               .withColumn("recall", F.round(rec, 6))
               .withColumn("f1", F.round(f1, 6)))


def q_ejoin_dice_multiset(spark, sf_dir):
    return J.ejoin(_docs(spark, sf_dir), similarity_threshold=0.8,
                   metric="dice", tokenization="standard_multiset",
                   round_to=6)


def q_ejoin_jaccard_qgrams(spark, sf_dir):
    return J.ejoin(_docs(spark, sf_dir), similarity_threshold=0.95,
                   metric="jaccard", tokenization="qgrams", qgrams=3,
                   round_to=6)


def _greedy_cluster_edges(spark, sf_dir):
    """Edge set for the greedy clusterers, thinned 8x (id1 % 8 = 0) so
    the DuckDB oracles' sequential recursive-CTE scans stay tractable."""
    docs, cands = _cnp_cands(spark, sf_dir)
    cands = cands.where(F.col("id1") % 8 == 0)
    return M.entity_matching(cands, docs, metric="cosine",
                             similarity_threshold=0.55, round_to=6)


def q_center_clustering(spark, sf_dir):
    m = _greedy_cluster_edges(spark, sf_dir)
    return CL.center_clustering(m, similarity_threshold=0.55, weight_col="sim")


def q_merge_center_clustering(spark, sf_dir):
    m = _greedy_cluster_edges(spark, sf_dir)
    return CL.center_clustering(m, similarity_threshold=0.55, weight_col="sim",
                                merge=True)


def q_best_match_clustering(spark, sf_dir):
    m = _greedy_cluster_edges(spark, sf_dir)
    return CL.best_match_clustering(m, similarity_threshold=0.55,
                                    weight_col="sim")


QUERIES = {
    "sb_blocks": q_sb_blocks,
    "sb_block_stats": q_sb_block_stats,
    "block_purging": q_block_purging,
    "block_filtering": q_block_filtering,
    "comparison_propagation": q_comparison_propagation,
    "wep_cbs": q_wep_cbs,
    "wep_js": q_wep_js,
    "wep_ecbs": q_wep_ecbs,
    "wep_x2": q_wep_x2,
    "wep_ejs": q_wep_ejs,
    "wnp_cbs": q_wnp_cbs,
    "rwnp_js": q_rwnp_js,
    "blast_cosine": q_blast_cosine,
    "cep_js": q_cep_js,
    "cnp_js": q_cnp_js,
    "rcnp_js": q_rcnp_js,
    "entity_matching_cosine": q_entity_matching_cosine,
    "der_dedup_clusters": q_der_dedup_clusters,
    "exact_dedup": q_exact_dedup,
    "doc_fingerprint": q_doc_fingerprint,
    "minhash_bands": q_minhash_bands,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "minhash_lsh_pairs_salted": q_minhash_lsh_pairs_salted,
    "minhash_near_dup": q_minhash_near_dup,
    "tiered_exact_dedup": q_tiered_exact_dedup,
    "tiered_near_dup": q_tiered_near_dup,
    "corpus_clean_tiered": q_corpus_clean_tiered,
    "simhash_signatures": q_simhash_signatures,
    "simhash_pairs": q_simhash_pairs,
    "substring_dedup": q_substring_dedup,
    "duplicate_spans": q_duplicate_spans,
    "source_quota": q_source_quota,
    "ngram_jaccard": q_ngram_jaccard,
    "ejoin_cosine": q_ejoin_cosine,
    "topk_join": q_topk_join,
    "pe_topk_join": q_pe_topk_join,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
    "line_dedup": q_line_dedup,
    "pii_counts": q_pii_counts,
    "repetition_stats": q_repetition_stats,
    "url_dedup": q_url_dedup,
    "corpus_clean": q_corpus_clean,
    "streaming_reconciled": q_streaming_reconciled,
    "schema_name_matches": q_schema_name_matches,
    "schema_jaccard_leven": q_schema_jaccard_leven,
    "schema_clustering": q_schema_clustering,
    "schema_clustered_er": q_schema_clustered_er,
    "rdf_predicate_docs": q_rdf_predicate_docs,
    "rdf_predicate_clusters": q_rdf_predicate_clusters,
    "rdf_subject_er": q_rdf_subject_er,
    "spatial_equigrid_cf": q_spatial_equigrid_cf,
    "spatial_equigrid_js": q_spatial_equigrid_js,
    "spatial_topk_mbr": q_spatial_topk_mbr,
    "spatial_relations": q_spatial_relations,
    "spatial_relation_stats": q_spatial_relation_stats,
    "meta_factory_wnp": q_meta_factory_wnp,
    "gopher_quality": q_gopher_quality,
    "source_stats": q_source_stats,
    "events_windowed": q_events_windowed,
    "ann_topk": q_ann_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_brute_topk": q_ann_brute_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_topk_from_text": q_ann_topk_from_text,
    "embedding_dedup": q_embedding_dedup,
    # rows-only (no SQL oracle): pandas-UDF path & sequential clusterer
    "webtext_minhash_clusters": q_webtext_minhash_clusters,
    "unique_mapping": q_unique_mapping,
    "unique_mapping_dist": q_unique_mapping_dist,
    "qgrams_blocking": q_qgrams_blocking,
    "suffix_blocking": q_suffix_blocking,
    "ext_suffix_blocking": q_ext_suffix_blocking,
    "ext_qgrams_blocking": q_ext_qgrams_blocking,
    "gpsn_acf": q_gpsn_acf,
    "gpsn_id": q_gpsn_id,
    "lpsn_ncf": q_lpsn_ncf,
    "pcep_topk": q_pcep_topk,
    "pcnp_dfs": q_pcnp_dfs,
    "random_pm": q_random_pm,
    "pes_hb": q_pes_hb,
    "progressive_recall": q_progressive_recall,
    "progressive_auc": q_progressive_auc,
    "meta_cnp_cleaned": q_meta_cnp_cleaned,
    "em_dice": q_em_dice,
    "em_generalized_jaccard": q_em_generalized_jaccard,
    "em_jaccard_quirk": q_em_jaccard_quirk,
    "em_overlap": q_em_overlap,
    "em_levenshtein": q_em_levenshtein,
    "em_jaro": q_em_jaro,
    "tfidf_cosine": q_tfidf_cosine,
    "tf_cosine": q_tf_cosine,
    "boolean_cosine": q_boolean_cosine,
    "clean_text": q_clean_text,
    "lsh_recall_eval": q_lsh_recall_eval,
    "workflow_report": q_workflow_report,
    "ejoin_dice_multiset": q_ejoin_dice_multiset,
    "ejoin_jaccard_qgrams": q_ejoin_jaccard_qgrams,
    "center_clustering": q_center_clustering,
    "merge_center_clustering": q_merge_center_clustering,
    "best_match_clustering": q_best_match_clustering,
    "media_features": q_media_features,
    "video_frame_sample": q_video_frame_sample,
    "audio_decode": q_audio_decode,
    "ccer_blocks": q_ccer_blocks,
    "ccer_pairs_cp": q_ccer_pairs_cp,
    "ccer_wep_js": q_ccer_wep_js,
    "ccer_em_cosine": q_ccer_em_cosine,
    "ccer_ccc": q_ccer_ccc,
    "ccer_unique_mapping": q_ccer_unique_mapping,
    "ccer_wep_ejs": q_ccer_wep_ejs,
    "ccer_wep_x2": q_ccer_wep_x2,
    "ccer_cnp_js": q_ccer_cnp_js,
    "ccer_rcnp_cncbs": q_ccer_rcnp_cncbs,
    "ccer_cep_js": q_ccer_cep_js,
    "ccer_blast_x2": q_ccer_blast_x2,
    "ccer_best_chain": q_ccer_best_chain,
    "markov_clustering": q_markov_clustering,
    "embeddings_nn_bpm": q_embeddings_nn_bpm,
    "topk_join_pm": q_topk_join_pm,
    "cut_clustering": q_cut_clustering,
    "correlation_clustering": q_correlation_clustering,
    "ricochet_clustering": q_ricochet_clustering,
    "kiraly_clustering": q_kiraly_clustering,
    "row_column_clustering": q_row_column_clustering,
}


def _build_oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    o["sb_blocks"] = f"""WITH {SB}
SELECT key AS token, count(*) AS block_size FROM sb GROUP BY key"""

    o["sb_block_stats"] = f"""WITH {SB},
sizes AS (SELECT key, count(*) AS block_size FROM sb GROUP BY key),
tot AS (SELECT sum(block_size) AS t FROM sizes)
SELECT count(*) AS num_blocks,
       CAST(sum(block_size) AS BIGINT) AS total_assignments,
       min(block_size) AS min_block_size,
       max(block_size) AS max_block_size,
       round(avg(block_size), 6) AS avg_block_size,
       CAST(sum(block_size * (block_size - 1) / 2) AS BIGINT) AS total_comparisons,
       round(median(block_size), 6) AS median_block_size,
       round(stddev_pop(block_size), 6) AS stddev_block_size,
       round(ln((SELECT max(t) FROM tot))
             - sum(block_size * ln(block_size)) / (SELECT max(t) FROM tot), 6)
           AS entropy
FROM sizes"""

    o["block_purging"] = f"""WITH {SB},
{_purging_sql('sb', 1.0, 'pp')}
SELECT c.key AS token, c.block_size, c.cardinality
FROM cards c, thr WHERE c.cardinality <= thr.t"""

    o["block_filtering"] = f"""WITH {SB},
{_filtering_sql('sb', 0.8, 'bf', 'bfc')}
SELECT key AS token, eid AS doc_id FROM bf"""

    o["comparison_propagation"] = f"""WITH {SB},
{_filtering_sql('sb', 0.8, 'bf', 'bfc')}
SELECT DISTINCT a.eid AS id1, b.eid AS id2
FROM bf a JOIN bf b ON a.key = b.key AND a.eid < b.eid"""

    for name, scheme in [("wep_cbs", "CBS"), ("wep_js", "JS")]:
        o[name] = f"""WITH {SB},
{_edges_sql('sb', scheme)}
SELECT id1, id2, round(w, 6) AS weight FROM e
WHERE w >= (SELECT avg(w) FROM e) - {EPS}"""

    # WEP with the log/chi2 schemes: same retained-set EPS band; the
    # scheme expressions mirror comparison_cleaning.edge_weights exactly
    o["wep_ecbs"] = f"""WITH {SB},
{_edges_sql('sb', 'CBS', 'xe')},
nblk AS (SELECT CAST(count(DISTINCT key) AS DOUBLE) AS n FROM sb),
we AS (
  SELECT x.id1, x.id2,
         x.cbs * log10(nblk.n / n1.nb) * log10(nblk.n / n2.nb) AS w
  FROM xe x
  JOIN xe_nb n1 ON n1.eid = x.id1 JOIN xe_nb n2 ON n2.eid = x.id2, nblk)
SELECT id1, id2, round(w, 6) AS weight FROM we
WHERE w >= (SELECT avg(w) FROM we) - {EPS}"""

    o["wep_x2"] = f"""WITH {SB},
{_edges_sql('sb', 'CBS', 'xe')},
nblk AS (SELECT CAST(count(DISTINCT key) AS DOUBLE) AS n FROM sb),
cells AS (
  SELECT x.id1, x.id2,
         CAST(x.cbs AS DOUBLE) AS o11,
         CAST(n1.nb - x.cbs AS DOUBLE) AS o12,
         CAST(n2.nb - x.cbs AS DOUBLE) AS o21,
         nblk.n - n1.nb + x.cbs AS o22
  FROM xe x
  JOIN xe_nb n1 ON n1.eid = x.id1 JOIN xe_nb n2 ON n2.eid = x.id2, nblk),
we AS (
  SELECT id1, id2,
         (CASE WHEN (o11+o12)*(o11+o21) <> 0 THEN
            (o11 - (o11+o12)*(o11+o21)/(o11+o12+o21+o22))
            * (o11 - (o11+o12)*(o11+o21)/(o11+o12+o21+o22))
            / ((o11+o12)*(o11+o21)/(o11+o12+o21+o22)) ELSE 0 END)
       + (CASE WHEN (o11+o12)*(o12+o22) <> 0 THEN
            (o12 - (o11+o12)*(o12+o22)/(o11+o12+o21+o22))
            * (o12 - (o11+o12)*(o12+o22)/(o11+o12+o21+o22))
            / ((o11+o12)*(o12+o22)/(o11+o12+o21+o22)) ELSE 0 END)
       + (CASE WHEN (o21+o22)*(o11+o21) <> 0 THEN
            (o21 - (o21+o22)*(o11+o21)/(o11+o12+o21+o22))
            * (o21 - (o21+o22)*(o11+o21)/(o11+o12+o21+o22))
            / ((o21+o22)*(o11+o21)/(o11+o12+o21+o22)) ELSE 0 END)
       + (CASE WHEN (o21+o22)*(o12+o22) <> 0 THEN
            (o22 - (o21+o22)*(o12+o22)/(o11+o12+o21+o22))
            * (o22 - (o21+o22)*(o12+o22)/(o11+o12+o21+o22))
            / ((o21+o22)*(o12+o22)/(o11+o12+o21+o22)) ELSE 0 END) AS w
  FROM cells)
SELECT id1, id2, round(w, 6) AS weight FROM we
WHERE w >= (SELECT avg(w) FROM we) - {EPS}"""

    o["wep_ejs"] = f"""WITH {SB},
{_edges_sql('sb', 'JS', 'xe')},
bidir_ej AS (
  SELECT id1 AS u FROM xe UNION ALL SELECT id2 FROM xe),
cmp AS (SELECT u, CAST(count(*) AS DOUBLE) AS c FROM bidir_ej GROUP BY u),
dd AS (SELECT CAST(count(*) AS DOUBLE) AS d FROM xe),
we AS (
  SELECT x.id1, x.id2,
         x.w * log10(dd.d / c1.c) * log10(dd.d / c2.c) AS w
  FROM xe x JOIN cmp c1 ON c1.u = x.id1 JOIN cmp c2 ON c2.u = x.id2, dd)
SELECT id1, id2, round(w, 6) AS weight FROM we
WHERE w >= (SELECT avg(w) FROM we) - {EPS}"""

    o["wnp_cbs"] = f"""WITH {SB},
{_edges_sql('sb', 'CBS')},
bidir AS (SELECT id1 AS node, w FROM e UNION ALL SELECT id2, w FROM e),
st AS (SELECT node, avg(w) AS s FROM bidir GROUP BY node)
SELECT e.id1, e.id2, round(e.w, 6) AS weight
FROM e JOIN st s1 ON s1.node = e.id1 JOIN st s2 ON s2.node = e.id2
WHERE e.w >= s1.s - {EPS} OR e.w >= s2.s - {EPS}"""

    # factory dispatch must be output-identical to calling WNP directly
    o["meta_factory_wnp"] = o["wnp_cbs"]

    o["rwnp_js"] = f"""WITH {SB},
{_edges_sql('sb', 'JS')},
bidir AS (SELECT id1 AS node, w FROM e UNION ALL SELECT id2, w FROM e),
st AS (SELECT node, avg(w) AS s FROM bidir GROUP BY node)
SELECT e.id1, e.id2, round(e.w, 6) AS weight
FROM e JOIN st s1 ON s1.node = e.id1 JOIN st s2 ON s2.node = e.id2
WHERE e.w >= s1.s - {EPS} AND e.w >= s2.s - {EPS}"""

    o["blast_cosine"] = f"""WITH {SB},
{_edges_sql('sb', 'COSINE')},
bidir AS (SELECT id1 AS node, w FROM e UNION ALL SELECT id2, w FROM e),
st AS (SELECT node, max(w) AS s FROM bidir GROUP BY node)
SELECT e.id1, e.id2, round(e.w, 6) AS weight
FROM e JOIN st s1 ON s1.node = e.id1 JOIN st s2 ON s2.node = e.id2
WHERE e.w >= (s1.s + s2.s) / 4 - {EPS}"""

    o["cep_js"] = f"""WITH {SB},
{_edges_sql('sb', 'JS')}
SELECT id1, id2, round(w, 6) AS weight FROM e
QUALIFY row_number() OVER (ORDER BY w DESC, id2 DESC, id1 DESC)
        <= (SELECT CAST(floor(count(*) / 2) AS BIGINT) FROM sb)"""

    o["cnp_js"] = f"""WITH {SB},
{_cnp_sql('sb', 'cnp', 'JS')}
SELECT id1, id2, round(weight, 6) AS weight FROM cnp"""

    o["rcnp_js"] = f"""WITH {SB},
{_edges_sql('sb', 'JS', 'rc_e')},
rc_bidir AS (
  SELECT id1 AS u, id2 AS v, w FROM rc_e
  UNION ALL SELECT id2, id1, w FROM rc_e),
rc_k AS (
  SELECT CAST(floor(greatest(1.0,
      (SELECT count(*) FROM sb) * 1.0
      / (SELECT count(*) FROM documents))) AS BIGINT) AS kv),
rc_top AS (
  SELECT u, v, w FROM (
    SELECT u, v, w,
           row_number() OVER (PARTITION BY u ORDER BY w DESC, v DESC) AS rn
    FROM rc_bidir)
  WHERE rn <= (SELECT kv FROM rc_k))
SELECT least(t.u, t.v) AS id1, greatest(t.u, t.v) AS id2,
       round(max(t.w), 6) AS weight
FROM rc_top t JOIN rc_top r ON r.u = t.v AND r.v = t.u
WHERE t.u < t.v
GROUP BY 1, 2"""

    o["entity_matching_cosine"] = f"""WITH {SB},
{_cnp_sql('sb', 'cnp', 'JS')},
{_matching_cosine_sql('cnp', 0.55, 'mt')}
SELECT id1, id2, sim FROM mt"""

    o["der_dedup_clusters"] = f"""WITH RECURSIVE {SB},
{_purging_sql('sb', 1.0, 'pp')},
{_filtering_sql('pp', 0.8, 'bf', 'bfc')},
{_cnp_sql('bf', 'cnp', 'JS')},
{_matching_cosine_sql('cnp', 0.55, 'mt')},
{_cc_sql('mt')}
SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u"""

    # order/float-dependent clusterers (cut/correlation/ricochet/
    # markov): the driver checks the deterministic _component_stats
    # projection — per component of the SAME thresholded match graph,
    # the partition (n_docs = component size, n_rows = n_docs) and
    # refinement (spanning_clusters = 0) invariants every correct run
    # satisfies regardless of pivot/iteration order. _cc_sql seeds
    # reach with ALL docs; HAVING >= 2 keeps exactly the edge-endpoint
    # components (every mt node has an edge; singleton components are
    # matchless docs the Spark side never sees).
    o["cut_clustering"] = f"""WITH RECURSIVE {SB},
{_cnp_sql('sb', 'cnp', 'JS')},
{_matching_cosine_sql('cnp', 0.9, 'mt')},
{_cc_sql('mt')},
cpr AS (SELECT u, min(v) AS comp_id FROM reach GROUP BY u)
SELECT comp_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS spanning_clusters
FROM cpr GROUP BY comp_id HAVING count(*) >= 2"""
    o["ricochet_clustering"] = o["cut_clustering"]
    o["markov_clustering"] = o["cut_clustering"]
    # correlation: partition property only — its move semantics
    # legitimately produce cross-component clusters (see
    # _component_stats docstring)
    o["correlation_clustering"] = f"""WITH RECURSIVE {SB},
{_cnp_sql('sb', 'cnp', 'JS')},
{_matching_cosine_sql('cnp', 0.9, 'mt')},
{_cc_sql('mt')},
cpr AS (SELECT u, min(v) AS comp_id FROM reach GROUP BY u)
SELECT comp_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_rows
FROM cpr GROUP BY comp_id HAVING count(*) >= 2"""

    # workflow_report: the best-DER chain's per-stage pair sets scored
    # against the exact 3-shingle-jaccard GT (same GT fragment as
    # lsh_recall_eval); tn = n(n-1)/2 - tp - fp - fn. Every stage is
    # snapshotted AS MATERIALIZED: each one feeds both the next stage
    # and several stats subqueries, and the recursive CC term would
    # otherwise re-expand the whole chain to parquet scans per
    # iteration (same fix as the schema_clustering oracles).
    o["workflow_report"] = f"""WITH RECURSIVE {SB},
m_sb AS MATERIALIZED (SELECT * FROM sb),
{_purging_sql('m_sb', 1.0, 'pp')},
m_pp AS MATERIALIZED (SELECT * FROM pp),
{_filtering_sql('m_pp', 0.8, 'bf', 'bfc')},
m_bf AS MATERIALIZED (SELECT * FROM bf),
{_cnp_sql('m_bf', 'cnp', 'JS')},
m_cnp AS MATERIALIZED (SELECT * FROM cnp),
{_matching_cosine_sql('m_cnp', 0.55, 'mt')},
m_mt AS MATERIALIZED (SELECT * FROM mt),
{_tokhash_sql(3)},
m_hx AS MATERIALIZED (SELECT * FROM hx),
ex3 AS (SELECT eid, unnest(sl) AS g FROM m_hx),
common3 AS (
  SELECT a.eid AS id1, b.eid AS id2, count(*) AS c
  FROM ex3 a JOIN ex3 b ON a.g = b.g AND a.eid < b.eid
  GROUP BY 1, 2),
gt AS MATERIALIZED (
  SELECT id1, id2 FROM (
    SELECT c.id1, c.id2,
           round(c.c * 1.0 / (len(x.sl) + len(y.sl) - c.c), 6) AS jaccard
    FROM common3 c JOIN m_hx x ON x.eid = c.id1 JOIN m_hx y ON y.eid = c.id2)
  WHERE jaccard >= 0.5),
sbp AS MATERIALIZED (SELECT DISTINCT a.eid AS id1, b.eid AS id2
        FROM m_sb a JOIN m_sb b ON a.key = b.key AND a.eid < b.eid),
ppp AS MATERIALIZED (SELECT DISTINCT a.eid AS id1, b.eid AS id2
        FROM m_pp a JOIN m_pp b ON a.key = b.key AND a.eid < b.eid),
bfp AS MATERIALIZED (SELECT DISTINCT a.eid AS id1, b.eid AS id2
        FROM m_bf a JOIN m_bf b ON a.key = b.key AND a.eid < b.eid),
wr_bidir AS MATERIALIZED (
  SELECT id1 AS u, id2 AS v FROM m_mt UNION SELECT id2, id1 FROM m_mt),
wr_reach(u, v) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.u, b.v FROM wr_reach r JOIN wr_bidir b ON r.v = b.u),
wr_clusters AS MATERIALIZED (
  SELECT u AS eid, min(v) AS cid FROM wr_reach GROUP BY u),
clp AS MATERIALIZED (SELECT a.eid AS id1, b.eid AS id2
        FROM wr_clusters a JOIN wr_clusters b
        ON a.cid = b.cid AND a.eid < b.eid),
stats AS (
  SELECT CAST(1 AS BIGINT) AS stage_idx, 'standard_blocking' AS stage,
         (SELECT count(*) FROM m_sb) AS n_rows,
         (SELECT count(*) FROM sbp) AS np,
         (SELECT count(*) FROM gt) AS ng,
         (SELECT count(*) FROM sbp p JOIN gt g
          ON g.id1 = p.id1 AND g.id2 = p.id2) AS tp
  UNION ALL SELECT 2, 'block_purging',
         (SELECT count(*) FROM m_pp), (SELECT count(*) FROM ppp),
         (SELECT count(*) FROM gt),
         (SELECT count(*) FROM ppp p JOIN gt g
          ON g.id1 = p.id1 AND g.id2 = p.id2)
  UNION ALL SELECT 3, 'block_filtering',
         (SELECT count(*) FROM m_bf), (SELECT count(*) FROM bfp),
         (SELECT count(*) FROM gt),
         (SELECT count(*) FROM bfp p JOIN gt g
          ON g.id1 = p.id1 AND g.id2 = p.id2)
  UNION ALL SELECT 4, 'CNP',
         (SELECT count(*) FROM m_cnp), (SELECT count(*) FROM m_cnp),
         (SELECT count(*) FROM gt),
         (SELECT count(*) FROM m_cnp p JOIN gt g
          ON g.id1 = p.id1 AND g.id2 = p.id2)
  UNION ALL SELECT 5, 'entity_matching',
         (SELECT count(*) FROM m_mt), (SELECT count(*) FROM m_mt),
         (SELECT count(*) FROM gt),
         (SELECT count(*) FROM m_mt p JOIN gt g
          ON g.id1 = p.id1 AND g.id2 = p.id2)
  UNION ALL SELECT 6, 'connected_components',
         (SELECT count(*) FROM wr_clusters), (SELECT count(*) FROM clp),
         (SELECT count(*) FROM gt),
         (SELECT count(*) FROM clp p JOIN gt g
          ON g.id1 = p.id1 AND g.id2 = p.id2)),
tot AS (SELECT CAST(count(*) AS BIGINT) * (count(*) - 1) // 2 AS t
        FROM documents)
SELECT 'best-der-workflow' AS workflow, stage_idx, stage, n_rows, tp,
       np - tp AS fp, ng - tp AS fn,
       CAST(tot.t - np - ng + tp AS BIGINT) AS tn,
       round(CASE WHEN np > 0 THEN tp * 1.0 / np ELSE 0.0 END, 6)
           AS "precision",
       round(CASE WHEN ng > 0 THEN tp * 1.0 / ng ELSE 0.0 END, 6) AS recall,
       round(CASE WHEN tp > 0 THEN
             2 * (tp * 1.0 / np) * (tp * 1.0 / ng)
             / (tp * 1.0 / np + tp * 1.0 / ng) ELSE 0.0 END, 6) AS f1
FROM stats, tot"""

    o["exact_dedup"] = """WITH h AS (
  SELECT doc_id, md5(lower(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents)
SELECT doc_id, fingerprint,
       count(*) OVER (PARTITION BY fingerprint) AS group_size,
       CAST(count(*) OVER (PARTITION BY fingerprint) > 1 AS BIGINT) AS is_duplicate,
       CAST(doc_id = min(doc_id) OVER (PARTITION BY fingerprint) AS BIGINT) AS keep
FROM h"""

    o["doc_fingerprint"] = """SELECT doc_id,
       md5(lower(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents"""

    o["minhash_bands"] = f"""WITH {_tokhash_sql(3)},
{_minhash_sig_sql(32)},
{_bands_sql(8, 4)}
SELECT eid AS doc_id, band_idx, band_hash FROM bands"""

    o["minhash_lsh_pairs"] = f"""WITH {_tokhash_sql(3)},
{_minhash_sig_sql(32)},
{_bands_sql(8, 4)}
SELECT DISTINCT a.eid AS id1, b.eid AS id2
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.eid < b.eid"""

    # identical pair set by construction — the salted enumerator must
    # reproduce the plain self-join bit-for-bit
    o["minhash_lsh_pairs_salted"] = o["minhash_lsh_pairs"]

    o["minhash_near_dup"] = f"""WITH {_tokhash_sql(3)},
{_minhash_sig_sql(32)},
{_bands_sql(8, 4)},
cand AS (
  SELECT DISTINCT a.eid AS id1, b.eid AS id2
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.eid < b.eid)
SELECT id1, id2, jaccard FROM (
  SELECT c.id1, c.id2,
         round(len(list_intersect(x.sl, y.sl)) * 1.0
               / (len(x.sl) + len(y.sl) - len(list_intersect(x.sl, y.sl))), 6)
         AS jaccard
  FROM cand c JOIN hx x ON x.eid = c.id1 JOIN hx y ON y.eid = c.id2)
WHERE jaccard >= 0.5"""

    # webtext pipeline: html-wrap -> extract (byte-identical) -> minhash
    # chain == the plain-text chain; CC to the component minimum
    o["webtext_minhash_clusters"] = f"""WITH RECURSIVE {_tokhash_sql(3)},
{_minhash_sig_sql(32)},
{_bands_sql(8, 4)},
wcand AS (
  SELECT DISTINCT a.eid AS id1, b.eid AS id2
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.eid < b.eid),
wver AS (
  SELECT id1, id2 FROM (
    SELECT c.id1, c.id2,
           round(len(list_intersect(x.sl, y.sl)) * 1.0
                 / (len(x.sl) + len(y.sl) - len(list_intersect(x.sl, y.sl))), 6)
           AS jaccard
    FROM wcand c JOIN hx x ON x.eid = c.id1 JOIN hx y ON y.eid = c.id2)
  WHERE jaccard >= 0.5),
{_cc_sql('wver')}
SELECT u AS eid, min(v) AS cluster_id FROM reach GROUP BY u"""

    # UMC greedy 1-1 matching: sequential desc-weight scan -> recursive
    # CTE walking edges in the reference's (1-w, id1, id2) PQ order,
    # carrying the matched-vertex set
    o["unique_mapping"] = f"""WITH RECURSIVE {SB},
{_cnp_sql('sb', 'cnp', 'JS')},
cnp8 AS (SELECT id1, id2 FROM cnp WHERE id1 % 8 = 0),
{_matching_cosine_sql('cnp8', 0.55, 'umt')},
umr AS MATERIALIZED (
  SELECT id1, id2, sim,
         row_number() OVER (ORDER BY (1.0 - sim), id1, id2) AS rn
  FROM umt),
umg AS (
  SELECT 0 AS rn, CAST([] AS BIGINT[]) AS matched,
         CAST(NULL AS BIGINT) AS m1, CAST(NULL AS BIGINT) AS m2,
         CAST(NULL AS DOUBLE) AS mw
  UNION ALL
  SELECT r.rn,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN g.matched
              ELSE list_append(list_append(g.matched, r.id1), r.id2) END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.id1 END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.id2 END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.sim END
  FROM umg g JOIN umr r ON r.rn = g.rn + 1)
SELECT m1 AS id1, m2 AS id2, mw AS weight FROM umg WHERE m1 IS NOT NULL"""
    o["unique_mapping_dist"] = o["unique_mapping"]

    o["simhash_signatures"] = f"""WITH {_simhash_sql()}
SELECT eid AS doc_id, simhash FROM sims"""

    chunk_sel = "\n  UNION ALL ".join(
        f"SELECT eid, simhash, {c} AS chunk_idx, (simhash >> {c * 8}) & 255 AS chunk_val FROM sims"
        for c in range(4))
    o["simhash_pairs"] = f"""WITH {_simhash_sql()},
chunks AS (
  {chunk_sel})
SELECT id1, id2, hamming FROM (
  SELECT DISTINCT a.eid AS id1, b.eid AS id2,
         bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS hamming
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       AND a.eid < b.eid)
WHERE hamming <= 3"""

    o["substring_dedup"] = """WITH t AS (
  SELECT doc_id AS eid,
         list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                     x -> x <> '') AS tl
  FROM documents),
wins AS (
  SELECT eid, md5(w) AS key FROM (
    SELECT eid, unnest(CASE WHEN len(tl) < 10 THEN []
        ELSE list_distinct(list_transform(range(1, len(tl) - 10 + 2),
             i -> array_to_string(list_slice(tl, i, i + 9), ' '))) END) AS w
    FROM t)
  GROUP BY eid, w)
SELECT a.eid AS id1, b.eid AS id2, count(*) AS shared_windows
FROM wins a JOIN wins b ON a.key = b.key AND a.eid < b.eid
GROUP BY 1, 2"""

    # source quota: the oracle is the NAIVE per-key window — the
    # histogram-split implementation must reproduce it bit-for-bit
    o["source_quota"] = """SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
  FROM documents)
WHERE rn <= 12"""

    # duplicate spans: positional windows (0-based pos = i-1), match
    # join, gaps-and-islands merge per (pair, diagonal) — the same
    # row_number trick in both engines
    o["duplicate_spans"] = """WITH t AS (
  SELECT doc_id AS eid,
         list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                     x -> x <> '') AS tl
  FROM documents),
pw AS (
  SELECT eid, i - 1 AS pos,
         md5(array_to_string(tl[i:i+9], ' ')) AS key
  FROM (SELECT eid, tl, unnest(range(1, len(tl) - 10 + 2)) AS i
        FROM t WHERE len(tl) >= 10)),
m AS (
  SELECT DISTINCT a.eid AS id1, b.eid AS id2, a.pos AS pos1, b.pos AS pos2
  FROM pw a JOIN pw b ON a.key = b.key AND a.eid < b.eid),
isl AS (
  SELECT id1, id2, pos1 - pos2 AS d, pos1,
         pos1 - row_number() OVER (PARTITION BY id1, id2, pos1 - pos2
                                   ORDER BY pos1) AS grp
  FROM m)
SELECT id1, id2,
       CAST(min(pos1) AS BIGINT) AS start1,
       CAST(min(pos1) - d AS BIGINT) AS start2,
       CAST(max(pos1) - min(pos1) + 10 AS BIGINT) AS span_tokens
FROM isl GROUP BY id1, id2, d, grp
HAVING max(pos1) - min(pos1) + 10 >= 10"""

    o["ngram_jaccard"] = """WITH t AS (
  SELECT doc_id AS eid,
         list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                     x -> x <> '') AS tl
  FROM documents),
sh AS (
  SELECT eid, CASE WHEN len(tl) < 3 THEN []
         ELSE list_distinct(list_transform(range(1, len(tl) - 3 + 2),
              i -> array_to_string(list_slice(tl, i, i + 2), ' '))) END AS sl
  FROM t),
ex AS (SELECT eid, unnest(sl) AS g FROM sh),
common AS (
  SELECT a.eid AS id1, b.eid AS id2, count(*) AS c
  FROM ex a JOIN ex b ON a.g = b.g AND a.eid < b.eid
  GROUP BY 1, 2)
SELECT id1, id2, jaccard FROM (
  SELECT c.id1, c.id2,
         round(c.c * 1.0 / (len(x.sl) + len(y.sl) - c.c), 6) AS jaccard
  FROM common c JOIN sh x ON x.eid = c.id1 JOIN sh y ON y.eid = c.id2)
WHERE jaccard >= 0.2"""

    _jointoks = """jt AS (
  SELECT doc_id AS eid,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                       x -> x <> '')) AS tl
  FROM documents),
jx AS (SELECT eid, len(tl) AS f, unnest(tl) AS tok FROM jt),
jc AS (
  SELECT a.eid AS id1, b.eid AS id2, a.f AS f1, b.f AS f2, count(*) AS c
  FROM jx a JOIN jx b ON a.tok = b.tok AND a.eid <> b.eid
  GROUP BY 1, 2, 3, 4)"""

    o["ejoin_cosine"] = f"""WITH {_jointoks}
SELECT id1, id2, sim FROM (
  SELECT id1, id2,
         round(c / (sqrt(CAST(f1 AS DOUBLE) * f2)), 6) AS sim
  FROM jc WHERE id1 < id2)
WHERE sim >= 0.95"""

    o["topk_join"] = f"""WITH {_jointoks},
s AS (
  SELECT id1, id2, round(c / (sqrt(CAST(f1 AS DOUBLE) * f2)), 6) AS sim
  FROM jc WHERE id1 < id2)
SELECT id1, id2, sim FROM s
QUALIFY row_number() OVER (ORDER BY sim DESC, id1, id2) <= 200"""

    o["pe_topk_join"] = f"""WITH {_jointoks},
s AS (
  SELECT id2 AS doc_id, id1 AS neighbor,
         round(c / (sqrt(CAST(f1 AS DOUBLE) * f2)), 6) AS sim
  FROM jc)
SELECT doc_id, neighbor, sim,
       row_number() OVER (PARTITION BY doc_id ORDER BY sim DESC, neighbor) AS rank
FROM s
QUALIFY rank <= 5"""

    langs = sorted(A.STOPWORDS)
    score_exprs = []
    for lang in langs:
        arr = "[" + ", ".join(f"'{w}'" for w in A.STOPWORDS[lang]) + "]"
        score_exprs.append(
            f"CAST(len(list_filter(tl, x -> list_contains({arr}, x))) AS DOUBLE)"
            f" AS s_{lang}")
    case_lang = "CASE " + " ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in langs) + " END"
    o["lang_id"] = f"""WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                     x -> x <> '') AS tl
  FROM documents),
sc AS (SELECT doc_id, {', '.join(score_exprs)} FROM t),
mx AS (SELECT *, greatest({', '.join('s_' + lang for lang in langs)}) AS m FROM sc)
SELECT doc_id, {case_lang} AS lang_pred, m AS lang_score FROM mx"""

    o["quality_score"] = f"""WITH {_quality_sql()}
SELECT doc_id, n_tokens, avg_token_len, stopword_ratio, unique_ratio,
       alpha_ratio, quality_score
FROM qsc"""

    # tiered dedup: survivor = best-quality member per cluster (tie ->
    # min id; unranked/NULL quality sorts last) — the window mirrors
    # cluster_survivors' min(struct(-rank, id)) aggregate
    o["tiered_exact_dedup"] = f"""WITH {_quality_sql()},
th AS (
  SELECT doc_id, md5(lower(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))) AS cluster_id
  FROM documents),
tm AS (
  SELECT th.doc_id, th.cluster_id,
         coalesce(qsc.quality_score, -1e308) AS r
  FROM th LEFT JOIN qsc ON qsc.doc_id = th.doc_id)
SELECT doc_id, cluster_id,
       first_value(doc_id) OVER (PARTITION BY cluster_id
                                 ORDER BY r DESC, doc_id) AS survivor,
       CAST(doc_id = first_value(doc_id) OVER (PARTITION BY cluster_id
                                               ORDER BY r DESC, doc_id)
            AS BIGINT) AS is_survivor
FROM tm"""

    o["tiered_near_dup"] = f"""WITH RECURSIVE {_quality_sql()},
{_tokhash_sql(3)},
{_minhash_sig_sql(32)},
{_bands_sql(8, 4)},
tcand AS (
  SELECT DISTINCT a.eid AS id1, b.eid AS id2
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.eid < b.eid),
tver AS (
  SELECT id1, id2 FROM (
    SELECT c.id1, c.id2,
           round(len(list_intersect(x.sl, y.sl)) * 1.0
                 / (len(x.sl) + len(y.sl) - len(list_intersect(x.sl, y.sl))), 6)
           AS jaccard
    FROM tcand c JOIN hx x ON x.eid = c.id1 JOIN hx y ON y.eid = c.id2)
  WHERE jaccard >= 0.5),
{_cc_sql('tver')},
tcl AS (SELECT u AS eid, min(v) AS cluster_id FROM reach GROUP BY u),
tmm AS (
  SELECT tcl.eid, tcl.cluster_id,
         coalesce(qsc.quality_score, -1e308) AS r
  FROM tcl LEFT JOIN qsc ON qsc.doc_id = tcl.eid)
SELECT eid AS doc_id, cluster_id,
       first_value(eid) OVER (PARTITION BY cluster_id
                              ORDER BY r DESC, eid) AS survivor,
       CAST(eid = first_value(eid) OVER (PARTITION BY cluster_id
                                         ORDER BY r DESC, eid)
            AS BIGINT) AS is_survivor
FROM tmm"""

    # line dedup: multi-line docs derived by ' the ' -> newline in BOTH
    # engines; first-occurrence = (doc_id, pos) order; positions are
    # 0-based in Spark / 1-based via generate_series here — only the
    # ORDER matters, which is identical
    o["line_dedup"] = """WITH base AS (
  SELECT doc_id, string_split(replace(text, ' the ', chr(10)), chr(10)) AS l
  FROM documents),
idx AS (
  SELECT doc_id, l, unnest(generate_series(1, len(l))) AS pos FROM base),
lines AS (
  SELECT doc_id, pos, trim(l[pos]) AS line FROM idx WHERE trim(l[pos]) <> ''),
marked AS (
  SELECT doc_id, pos, line,
         count(*) OVER (PARTITION BY line) AS cnt,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM lines),
kept AS (SELECT doc_id, pos, line FROM marked WHERE cnt < 2 OR rn = 1),
rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id),
totals AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(t.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(r.clean_text, '') AS clean_text
FROM documents d
LEFT JOIN totals t ON t.doc_id = d.doc_id
LEFT JOIN rebuilt r ON r.doc_id = d.doc_id"""

    o["pii_counts"] = """SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text,
            '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
         AS n_ipv4,
       CAST(len(regexp_extract_all(text,
            '\\+\\d[\\d()\\- ]{7,}\\d')) AS BIGINT) AS n_phoneish
FROM documents"""

    en_arr = "[" + ", ".join(f"'{w}'" for w in A.STOPWORDS["en"]) + "]"

    def _gopher_sql(src: str) -> str:
        """CTE chain ``g_t -> g_feat -> g_pass`` computing the Gopher
        signals + pass flag over ``src`` (doc_id, text) — shared by the
        standalone gopher_quality oracle and corpus_clean."""
        return f"""g_t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                     x -> x <> '') AS tl,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)), x -> x <> '') AS ll
  FROM {src}),
g_feat AS (
  SELECT doc_id,
         len(tl) AS n_words,
         CASE WHEN len(tl) > 0 THEN
           list_sum(list_transform(tl, x -> len(x))) * 1.0 / len(tl)
         ELSE 0.0 END AS mean_word_len,
         CASE WHEN len(tl) > 0 THEN
           (len(regexp_extract_all(text, '#'))
            + len(regexp_extract_all(text, '\\.\\.\\.'))) * 1.0 / len(tl)
         ELSE 0.0 END AS symbol_ratio,
         CASE WHEN len(tl) > 0 THEN
           len(list_filter(tl, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0
             / len(tl)
         ELSE 0.0 END AS alpha_word_frac,
         len(list_intersect(list_distinct(tl), {en_arr})) AS n_stopwords,
         CASE WHEN len(ll) > 0 THEN
           len(list_filter(ll, x -> starts_with(x, '-')
                                    OR starts_with(x, '*'))) * 1.0 / len(ll)
         ELSE 0.0 END AS bullet_line_frac,
         CASE WHEN len(ll) > 0 THEN
           len(list_filter(ll, x -> ends_with(x, '...'))) * 1.0 / len(ll)
         ELSE 0.0 END AS ellipsis_line_frac
  FROM g_t),
g_pass AS (
  SELECT *, CASE WHEN n_words >= 50 AND n_words <= 100000
                  AND mean_word_len >= 3 AND mean_word_len <= 10
                  AND symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8
                  AND n_stopwords >= 2 AND bullet_line_frac < 0.9
                  AND ellipsis_line_frac < 0.3
             THEN 1 ELSE 0 END AS passes
  FROM g_feat)"""

    o["gopher_quality"] = f"""WITH {_gopher_sql('documents')},
feat AS (SELECT * FROM g_pass)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       round(mean_word_len, 6) AS mean_word_len,
       round(symbol_ratio, 6) AS symbol_ratio,
       round(alpha_word_frac, 6) AS alpha_word_frac,
       CAST(n_stopwords AS BIGINT) AS n_stopwords,
       round(bullet_line_frac, 6) AS bullet_line_frac,
       round(ellipsis_line_frac, 6) AS ellipsis_line_frac,
       CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                  AND mean_word_len >= 3 AND mean_word_len <= 10
                  AND symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8
                  AND n_stopwords >= 2 AND bullet_line_frac < 0.9
                  AND ellipsis_line_frac < 0.3
             THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM feat"""

    # url dedup: the derived url + canonicalization replicated 1:1
    # (scheme/host lower, default port strip, fragment drop, tracking
    # params drop, param sort — binary collation in both engines)
    o["url_dedup"] = r"""WITH raw AS (
  SELECT doc_id,
         'HTTPS://' || upper(source) || '.example.com:443/Crawl/'
         || CAST(doc_id % 50 AS VARCHAR) || '/'
         || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1#frag'
                 WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '' END AS url
  FROM documents),
parts AS (
  SELECT doc_id,
    lower(regexp_extract(url,
      '^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$',
      1)) AS scheme,
    regexp_replace(lower(regexp_extract(url,
      '^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$',
      2)), ':(80|443)$', '') AS host,
    regexp_replace(regexp_extract(url,
      '^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$',
      3), '/+$', '') AS path,
    regexp_extract(url,
      '^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$',
      4) AS q
  FROM raw),
canon AS (
  SELECT doc_id,
    (CASE WHEN scheme <> '' THEN scheme || '://' ELSE '' END)
    || host || path
    || (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) AS url_canon
  FROM (SELECT doc_id, scheme, host, path,
          array_to_string(list_sort(list_filter(string_split(q, '&'),
            p -> p <> '' AND NOT regexp_matches(p,
                 '^(utm_[^=]*|fbclid|gclid)(=|$)'))), '&') AS qs
        FROM parts)),
surv AS (SELECT url_canon, min(doc_id) AS survivor FROM canon GROUP BY 1)
SELECT c.doc_id, c.url_canon, s.survivor,
       CAST(CASE WHEN c.doc_id <> s.survivor THEN 1 ELSE 0 END AS BIGINT)
         AS is_dup
FROM canon c JOIN surv s ON s.url_canon = c.url_canon"""

    # corpus_clean: the four-stage cleaning pipeline composed from the
    # individually-proven fragments — url canon (url_dedup), exact
    # fingerprint, gopher gate (_gopher_sql), minhash-LSH + jaccard +
    # recursive-CTE connected components (_cc_sql). Each stage filters
    # the previous stage's survivor set, exactly like the Spark chain.
    _URL_PAT = (r"'^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?([^/?#]*)"
                r"([^?#]*)(?:\?([^#]*))?(?:#.*)?$'")
    o["corpus_clean"] = f"""WITH RECURSIVE raw AS (
  SELECT doc_id,
         'HTTPS://' || upper(source) || '.example.com:443/Crawl/'
         || CAST(doc_id % 50 AS VARCHAR) || '/'
         || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1#frag'
                 WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '' END AS url
  FROM documents),
cn AS (
  SELECT doc_id,
    (CASE WHEN scheme <> '' THEN scheme || '://' ELSE '' END) || host || path
    || (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) AS url_canon
  FROM (SELECT doc_id, scheme, host, path,
          array_to_string(list_sort(list_filter(string_split(q, '&'),
            p -> p <> '' AND NOT regexp_matches(p,
                 '^(utm_[^=]*|fbclid|gclid)(=|$)'))), '&') AS qs
        FROM (SELECT doc_id,
                lower(regexp_extract(url, {_URL_PAT}, 1)) AS scheme,
                regexp_replace(lower(regexp_extract(url, {_URL_PAT}, 2)),
                               ':(80|443)$', '') AS host,
                regexp_replace(regexp_extract(url, {_URL_PAT}, 3),
                               '/+$', '') AS path,
                regexp_extract(url, {_URL_PAT}, 4) AS q
              FROM raw))),
usurv AS (SELECT url_canon, min(doc_id) AS survivor FROM cn GROUP BY 1),
url_drop AS (
  SELECT c.doc_id, s.survivor FROM cn c
  JOIN usurv s ON s.url_canon = c.url_canon WHERE c.doc_id <> s.survivor),
rem1 AS (
  SELECT c.doc_id FROM cn c
  JOIN usurv s ON s.url_canon = c.url_canon WHERE c.doc_id = s.survivor),
eh AS (
  SELECT d.doc_id,
         md5(lower(regexp_replace(coalesce(d.text, ''), '\\s+', ' ', 'g'))) AS fp
  FROM documents d JOIN rem1 ON rem1.doc_id = d.doc_id),
es AS (SELECT fp, min(doc_id) AS m FROM eh GROUP BY fp),
exact_drop AS (
  SELECT eh.doc_id, es.m FROM eh JOIN es ON es.fp = eh.fp
  WHERE eh.doc_id <> es.m),
rem2 AS (SELECT doc_id FROM eh JOIN es ON es.fp = eh.fp WHERE doc_id = m),
g_src AS (
  SELECT d.doc_id, d.text FROM documents d JOIN rem2 ON rem2.doc_id = d.doc_id),
{_gopher_sql('g_src')},
q_drop AS (SELECT doc_id FROM g_pass WHERE passes = 0),
rem3 AS (SELECT doc_id FROM g_pass WHERE passes = 1),
{_tokhash_sql(3)},
{_minhash_sig_sql(32)},
{_bands_sql(8, 4)},
ccand AS (
  SELECT DISTINCT a.eid AS id1, b.eid AS id2
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.eid < b.eid
  JOIN rem3 r1 ON r1.doc_id = a.eid JOIN rem3 r2 ON r2.doc_id = b.eid),
cver AS (
  SELECT id1, id2 FROM (
    SELECT c.id1, c.id2,
           round(len(list_intersect(x.sl, y.sl)) * 1.0
                 / (len(x.sl) + len(y.sl) - len(list_intersect(x.sl, y.sl))), 6)
           AS jaccard
    FROM ccand c JOIN hx x ON x.eid = c.id1 JOIN hx y ON y.eid = c.id2)
  WHERE jaccard >= 0.5),
{_cc_sql('cver')},
clus AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
nd_drop AS (
  SELECT c.doc_id, c.cluster_id FROM clus c
  JOIN rem3 ON rem3.doc_id = c.doc_id WHERE c.cluster_id <> c.doc_id),
kept AS (
  SELECT c.doc_id FROM clus c
  JOIN rem3 ON rem3.doc_id = c.doc_id WHERE c.cluster_id = c.doc_id)
SELECT doc_id, 'kept' AS status, CAST(doc_id AS BIGINT) AS survivor FROM kept
UNION ALL
SELECT doc_id, 'url_dup', CAST(survivor AS BIGINT) FROM url_drop
UNION ALL
SELECT doc_id, 'exact_dup', CAST(m AS BIGINT) FROM exact_drop
UNION ALL
SELECT doc_id, 'low_quality', CAST(NULL AS BIGINT) FROM q_drop
UNION ALL
SELECT doc_id, 'near_dup', CAST(cluster_id AS BIGINT) FROM nd_drop"""

    # the reconciled streaming state must equal the batch pipeline
    # bit-for-bit — same oracle, no weaker claim
    o["streaming_reconciled"] = o["corpus_clean"]

    # tiered variant: every stage's survivor = highest quality_score
    # (tie min id), and the survivor is what proceeds downstream —
    # rem1/rem2 follow the tiered pick, mirroring the Spark pipeline
    o["corpus_clean_tiered"] = f"""WITH RECURSIVE {_quality_sql()},
raw AS (
  SELECT doc_id,
         'HTTPS://' || upper(source) || '.example.com:443/Crawl/'
         || CAST(doc_id % 50 AS VARCHAR) || '/'
         || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1#frag'
                 WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '' END AS url
  FROM documents),
cn AS (
  SELECT doc_id,
    (CASE WHEN scheme <> '' THEN scheme || '://' ELSE '' END) || host || path
    || (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) AS url_canon
  FROM (SELECT doc_id, scheme, host, path,
          array_to_string(list_sort(list_filter(string_split(q, '&'),
            p -> p <> '' AND NOT regexp_matches(p,
                 '^(utm_[^=]*|fbclid|gclid)(=|$)'))), '&') AS qs
        FROM (SELECT doc_id,
                lower(regexp_extract(url, {_URL_PAT}, 1)) AS scheme,
                regexp_replace(lower(regexp_extract(url, {_URL_PAT}, 2)),
                               ':(80|443)$', '') AS host,
                regexp_replace(regexp_extract(url, {_URL_PAT}, 3),
                               '/+$', '') AS path,
                regexp_extract(url, {_URL_PAT}, 4) AS q
              FROM raw))),
usurv AS (
  SELECT DISTINCT url_canon,
         first_value(doc_id) OVER (PARTITION BY url_canon
                                   ORDER BY r DESC, doc_id) AS survivor
  FROM (SELECT c.doc_id, c.url_canon,
               coalesce(q.quality_score, -1e308) AS r
        FROM cn c LEFT JOIN qsc q ON q.doc_id = c.doc_id)),
url_drop AS (
  SELECT c.doc_id, s.survivor FROM cn c
  JOIN usurv s ON s.url_canon = c.url_canon WHERE c.doc_id <> s.survivor),
rem1 AS (
  SELECT c.doc_id FROM cn c
  JOIN usurv s ON s.url_canon = c.url_canon WHERE c.doc_id = s.survivor),
eh AS (
  SELECT d.doc_id,
         md5(lower(regexp_replace(coalesce(d.text, ''), '\\s+', ' ', 'g'))) AS fp
  FROM documents d JOIN rem1 ON rem1.doc_id = d.doc_id),
es AS (
  SELECT DISTINCT fp,
         first_value(doc_id) OVER (PARTITION BY fp
                                   ORDER BY r DESC, doc_id) AS m
  FROM (SELECT eh.doc_id, eh.fp, coalesce(q.quality_score, -1e308) AS r
        FROM eh LEFT JOIN qsc q ON q.doc_id = eh.doc_id)),
exact_drop AS (
  SELECT eh.doc_id, es.m FROM eh JOIN es ON es.fp = eh.fp
  WHERE eh.doc_id <> es.m),
rem2 AS (SELECT doc_id FROM eh JOIN es ON es.fp = eh.fp WHERE doc_id = m),
g_src AS (
  SELECT d.doc_id, d.text FROM documents d JOIN rem2 ON rem2.doc_id = d.doc_id),
{_gopher_sql('g_src')},
q_drop AS (SELECT doc_id FROM g_pass WHERE passes = 0),
rem3 AS (SELECT doc_id FROM g_pass WHERE passes = 1),
{_tokhash_sql(3)},
{_minhash_sig_sql(32)},
{_bands_sql(8, 4)},
ccand AS (
  SELECT DISTINCT a.eid AS id1, b.eid AS id2
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.eid < b.eid
  JOIN rem3 r1 ON r1.doc_id = a.eid JOIN rem3 r2 ON r2.doc_id = b.eid),
cver AS (
  SELECT id1, id2 FROM (
    SELECT c.id1, c.id2,
           round(len(list_intersect(x.sl, y.sl)) * 1.0
                 / (len(x.sl) + len(y.sl) - len(list_intersect(x.sl, y.sl))), 6)
           AS jaccard
    FROM ccand c JOIN hx x ON x.eid = c.id1 JOIN hx y ON y.eid = c.id2)
  WHERE jaccard >= 0.5),
{_cc_sql('cver')},
clus AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
rep AS (
  SELECT DISTINCT cluster_id,
         first_value(doc_id) OVER (PARTITION BY cluster_id
                                   ORDER BY r DESC, doc_id) AS rep_id
  FROM (SELECT c.doc_id, c.cluster_id,
               coalesce(q.quality_score, -1e308) AS r
        FROM clus c JOIN rem3 ON rem3.doc_id = c.doc_id
        LEFT JOIN qsc q ON q.doc_id = c.doc_id)),
nd_drop AS (
  SELECT c.doc_id, p.rep_id FROM clus c
  JOIN rem3 ON rem3.doc_id = c.doc_id
  JOIN rep p ON p.cluster_id = c.cluster_id WHERE c.doc_id <> p.rep_id),
kept AS (
  SELECT c.doc_id FROM clus c
  JOIN rem3 ON rem3.doc_id = c.doc_id
  JOIN rep p ON p.cluster_id = c.cluster_id WHERE c.doc_id = p.rep_id)
SELECT doc_id, 'kept' AS status, CAST(doc_id AS BIGINT) AS survivor FROM kept
UNION ALL
SELECT doc_id, 'url_dup', CAST(survivor AS BIGINT) FROM url_drop
UNION ALL
SELECT doc_id, 'exact_dup', CAST(m AS BIGINT) FROM exact_drop
UNION ALL
SELECT doc_id, 'low_quality', CAST(NULL AS BIGINT) FROM q_drop
UNION ALL
SELECT doc_id, 'near_dup', CAST(rep_id AS BIGINT) FROM nd_drop"""

    # spatial ER: shared envelope-synthesis + equigrid CTEs; cell
    # indexing is range-EXCLUSIVE at the ceil bound (reference
    # addToIndex) while the JS block count keeps its +1 quirk
    _SPATIAL_BASE = """src AS (
  SELECT c_custkey AS id,
         CAST((c_custkey * 37) % 997 AS DOUBLE) AS minx,
         CAST((c_custkey * 59) % 983 AS DOUBLE) AS miny,
         CAST((c_custkey * 37) % 997 + 1 + (c_custkey % 19) AS DOUBLE) AS maxx,
         CAST((c_custkey * 59) % 983 + 1 + (c_custkey % 13) AS DOUBLE) AS maxy
  FROM customer),
tgt AS (
  SELECT s_suppkey AS id,
         CAST((s_suppkey * 41) % 997 AS DOUBLE) AS minx,
         CAST((s_suppkey * 67) % 983 AS DOUBLE) AS miny,
         CAST((s_suppkey * 41) % 997 + 1 + (s_suppkey % 23) AS DOUBLE) AS maxx,
         CAST((s_suppkey * 67) % 983 + 1 + (s_suppkey % 17) AS DOUBLE) AS maxy
  FROM tgt0),
th AS (SELECT sum(maxx - minx) / count(*) AS tx,
              sum(maxy - miny) / count(*) AS ty FROM src),
cs AS (
  SELECT id AS source_id, cx.x AS cx, cy.y AS cy FROM src, th,
       LATERAL (SELECT unnest(generate_series(
           CAST(floor(minx / th.tx) AS BIGINT),
           CAST(ceil(maxx / th.tx) AS BIGINT) - 1)) AS x) cx,
       LATERAL (SELECT unnest(generate_series(
           CAST(floor(miny / th.ty) AS BIGINT),
           CAST(ceil(maxy / th.ty) AS BIGINT) - 1)) AS y) cy),
ct AS (
  SELECT id AS target_id, cx.x AS cx, cy.y AS cy FROM tgt, th,
       LATERAL (SELECT unnest(generate_series(
           CAST(floor(minx / th.tx) AS BIGINT),
           CAST(ceil(maxx / th.tx) AS BIGINT) - 1)) AS x) cx,
       LATERAL (SELECT unnest(generate_series(
           CAST(floor(miny / th.ty) AS BIGINT),
           CAST(ceil(maxy / th.ty) AS BIGINT) - 1)) AS y) cy),
common AS (
  SELECT source_id, target_id, count(*) AS common_cells
  FROM cs JOIN ct USING (cx, cy) GROUP BY source_id, target_id),
cand AS (
  SELECT c.source_id, c.target_id, c.common_cells,
         s.minx AS s_minx, s.miny AS s_miny, s.maxx AS s_maxx,
         s.maxy AS s_maxy,
         t.minx AS t_minx, t.miny AS t_miny, t.maxx AS t_maxx,
         t.maxy AS t_maxy
  FROM common c
  JOIN src s ON s.id = c.source_id
  JOIN tgt t ON t.id = c.target_id
  WHERE s.minx <= t.maxx AND t.minx <= s.maxx
    AND s.miny <= t.maxy AND t.miny <= s.maxy)""".replace(
        "FROM tgt0", "FROM supplier")

    o["spatial_equigrid_cf"] = f"""WITH {_SPATIAL_BASE}
SELECT source_id, target_id, CAST(common_cells AS BIGINT) AS common_cells,
       round(CAST(common_cells AS DOUBLE), 6) AS weight
FROM cand"""

    o["spatial_equigrid_js"] = f"""WITH {_SPATIAL_BASE}
SELECT source_id, target_id, CAST(common_cells AS BIGINT) AS common_cells,
       round(common_cells /
         ((CAST(ceil(s_maxx / th.tx) AS BIGINT)
           - CAST(floor(s_minx / th.tx) AS BIGINT) + 1)
          * (CAST(ceil(s_maxy / th.ty) AS BIGINT)
             - CAST(floor(s_miny / th.ty) AS BIGINT) + 1)
          + (CAST(ceil(t_maxx / th.tx) AS BIGINT)
             - CAST(floor(t_minx / th.tx) AS BIGINT) + 1)
            * (CAST(ceil(t_maxy / th.ty) AS BIGINT)
               - CAST(floor(t_miny / th.ty) AS BIGINT) + 1)
          - common_cells), 6) AS weight
FROM cand, th"""

    o["spatial_topk_mbr"] = f"""WITH {_SPATIAL_BASE},
mbr AS (
  SELECT source_id, target_id,
         greatest(0.0, least(s_maxx, t_maxx) - greatest(s_minx, t_minx))
         * greatest(0.0, least(s_maxy, t_maxy) - greatest(s_miny, t_miny))
           AS inter,
         (s_maxx - s_minx) * (s_maxy - s_miny)
         + (t_maxx - t_minx) * (t_maxy - t_miny) AS both_areas
  FROM cand)
SELECT source_id, target_id,
       round(CASE WHEN both_areas - inter <> 0
                  THEN inter / (both_areas - inter) ELSE 0.0 END, 6) AS weight
FROM mbr
ORDER BY weight DESC, source_id DESC, target_id DESC"""

    # DE-9IM layer: same CTEs but cand WITHOUT the validity filter (the
    # classifier wants disjoint cell-co-occurring pairs too), then the
    # exact rectangle relate matrix + the reference's pattern algebra
    _SPATIAL_BASE_ALL = _SPATIAL_BASE.replace(
        """
  WHERE s.minx <= t.maxx AND t.minx <= s.maxx
    AND s.miny <= t.maxy AND t.miny <= s.maxy""", "")
    assert "WHERE s.minx" not in _SPATIAL_BASE_ALL

    def _edge_in_int_sql(a, b):
        # box b's boundary enters box a's OPEN interior
        return (
            f"((({a}_minx < {b}_minx AND {b}_minx < {a}_maxx)"
            f" OR ({a}_minx < {b}_maxx AND {b}_maxx < {a}_maxx))"
            f" AND greatest({a}_miny,{b}_miny) < least({a}_maxy,{b}_maxy))"
            f" OR ((({a}_miny < {b}_miny AND {b}_miny < {a}_maxy)"
            f" OR ({a}_miny < {b}_maxy AND {b}_maxy < {a}_maxy))"
            f" AND greatest({a}_minx,{b}_minx) < least({a}_maxx,{b}_maxx))")

    def _cross_sql(a, b):
        # vertical edge of b crosses/touches a horizontal edge of a
        return (
            f"((({a}_minx <= {b}_minx AND {b}_minx <= {a}_maxx)"
            f" OR ({a}_minx <= {b}_maxx AND {b}_maxx <= {a}_maxx))"
            f" AND (({b}_miny <= {a}_miny AND {a}_miny <= {b}_maxy)"
            f" OR ({b}_miny <= {a}_maxy AND {a}_maxy <= {b}_maxy)))")

    _II = ("greatest(s_minx,t_minx) < least(s_maxx,t_maxx)"
           " AND greatest(s_miny,t_miny) < least(s_maxy,t_maxy)")
    _S_IN_T = ("t_minx <= s_minx AND s_maxx <= t_maxx"
               " AND t_miny <= s_miny AND s_maxy <= t_maxy")
    _T_IN_S = ("s_minx <= t_minx AND t_maxx <= s_maxx"
               " AND s_miny <= t_miny AND t_maxy <= s_maxy")
    _BB1 = (
        "((s_minx = t_minx OR s_minx = t_maxx OR s_maxx = t_minx"
        " OR s_maxx = t_maxx)"
        " AND greatest(s_miny,t_miny) < least(s_maxy,t_maxy))"
        " OR ((s_miny = t_miny OR s_miny = t_maxy OR s_maxy = t_miny"
        " OR s_maxy = t_maxy)"
        " AND greatest(s_minx,t_minx) < least(s_maxx,t_maxx))")
    _BB0 = f"({_cross_sql('s', 't')}) OR ({_cross_sql('t', 's')})"

    _DE9IM_EXPR = (
        f"CASE WHEN {_II} THEN '2' ELSE 'F' END"
        f" || CASE WHEN {_edge_in_int_sql('s', 't')} THEN '1' ELSE 'F' END"
        f" || CASE WHEN {_S_IN_T} THEN 'F' ELSE '2' END"
        f" || CASE WHEN {_edge_in_int_sql('t', 's')} THEN '1' ELSE 'F' END"
        f" || CASE WHEN {_BB1} THEN '1' WHEN {_BB0} THEN '0' ELSE 'F' END"
        f" || CASE WHEN {_S_IN_T} THEN 'F' ELSE '1' END"
        f" || CASE WHEN {_T_IN_S} THEN 'F' ELSE '2' END"
        f" || CASE WHEN {_T_IN_S} THEN 'F' ELSE '1' END"
        f" || '2'")

    def _pat_sql(pat: str) -> str:
        conds = []
        for i, p in enumerate(pat):
            if p == "*":
                continue
            c = f"substr(de9im,{i + 1},1)"
            conds.append(f"{c} IN ('0','1','2')" if p == "T"
                         else f"{c} = '{p}'")
        return "(" + " AND ".join(conds) + ")"

    from pyjedai_spark.operators.spatial import DE9IM_RELATIONS
    _REL_FLAGS = {"intersects": f"(NOT {_pat_sql('FF*FF****')})"}
    for _rn, _pats in DE9IM_RELATIONS.items():
        _REL_FLAGS[_rn] = "(" + " OR ".join(_pat_sql(p) for p in _pats) + ")"
    # "overlaps" is a reserved operator keyword in DuckDB — quote it
    _FLAG_SELECT = ",\n       ".join(
        f'CAST({e} AS INTEGER) AS "{n}"' for n, e in _REL_FLAGS.items())
    _LINK_SUM = " + ".join(f"CAST({e} AS INTEGER)"
                           for e in _REL_FLAGS.values())

    _SPATIAL_REL_CTE = f"""{_SPATIAL_BASE_ALL},
m AS (
  SELECT source_id, target_id, {_DE9IM_EXPR} AS de9im FROM cand),
rel AS (
  SELECT source_id, target_id, de9im,
       {_FLAG_SELECT},
       {_LINK_SUM} AS detected_links
  FROM m)"""

    o["spatial_relations"] = f"""WITH {_SPATIAL_REL_CTE}
SELECT source_id, target_id, de9im, intersects, contains, within,
       covered_by, covers, crosses, equals, "overlaps", touches,
       detected_links,
       CAST(detected_links > 0 AS INTEGER) AS related
FROM rel"""

    o["spatial_relation_stats"] = f"""WITH {_SPATIAL_REL_CTE}
SELECT count(*) AS verified_pairs,
       CAST(sum(detected_links) AS BIGINT) AS detected_links,
       CAST(sum(CASE WHEN detected_links > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS interlinked_geometries,
       CAST(sum(contains) AS BIGINT) AS n_contains,
       CAST(sum(covered_by) AS BIGINT) AS n_covered_by,
       CAST(sum(covers) AS BIGINT) AS n_covers,
       CAST(sum(crosses) AS BIGINT) AS n_crosses,
       CAST(sum(equals) AS BIGINT) AS n_equals,
       CAST(sum(intersects) AS BIGINT) AS n_intersects,
       CAST(sum("overlaps") AS BIGINT) AS n_overlaps,
       CAST(sum(touches) AS BIGINT) AS n_touches,
       CAST(sum(within) AS BIGINT) AS n_within
FROM rel
LIMIT 200"""

    # schema matching: the name leg enumerates both column-name lists as
    # VALUES; the instance leg mirrors the fuzzy-Jaccard definition with
    # a plain cross join (band-join optimization is engine-side only)
    _CUST_COLS = "('c_custkey'),('c_name'),('c_nationkey'),('c_acctbal')," \
                 "('c_mktsegment')"
    _SUPP_COLS = "('s_suppkey'),('s_name'),('s_nationkey'),('s_acctbal')"
    o["schema_name_matches"] = f"""WITH a(col1) AS (VALUES {_CUST_COLS}),
b(col2) AS (VALUES {_SUPP_COLS})
SELECT col1, col2,
       round(CASE WHEN greatest(length(lower(col1)), length(lower(col2))) > 0
             THEN 1.0 - levenshtein(lower(col1), lower(col2)) * 1.0
                  / greatest(length(lower(col1)), length(lower(col2)))
             ELSE 1.0 END, 6) AS score
FROM a CROSS JOIN b"""

    o["schema_jaccard_leven"] = """WITH v1 AS (
  SELECT 'c_name' AS col1, val FROM (
    SELECT DISTINCT c_name AS val FROM customer WHERE c_name IS NOT NULL)
  UNION ALL
  SELECT 'c_mktsegment', val FROM (
    SELECT DISTINCT c_mktsegment AS val FROM customer
    WHERE c_mktsegment IS NOT NULL)),
v2 AS (
  SELECT 's_name' AS col2, val FROM (
    SELECT DISTINCT s_name AS val FROM supplier WHERE s_name IS NOT NULL)),
n1 AS (SELECT col1, count(*) AS n1 FROM v1 GROUP BY col1),
n2 AS (SELECT col2, count(*) AS n2 FROM v2 GROUP BY col2),
m AS (
  SELECT col1, col2, count(DISTINCT a.val) AS inter
  FROM v1 a CROSS JOIN v2 b
  WHERE round(CASE WHEN greatest(length(a.val), length(b.val)) > 0
        THEN 1.0 - levenshtein(a.val, b.val) * 1.0
             / greatest(length(a.val), length(b.val))
        ELSE 1.0 END, 6) >= 0.8
  GROUP BY col1, col2)
SELECT n1.col1, n2.col2,
       round(coalesce(inter * 1.0 / (n1 + n2 - inter), 0.0), 6) AS score
FROM n1 CROSS JOIN n2
LEFT JOIN m ON m.col1 = n1.col1 AND m.col2 = n2.col2"""

    # ---------------- schema clustering (attribute-level ER workflow)
    # The full reference chain in SQL over the deterministic fixture:
    # attribute value-documents -> CCER standard blocking -> purging
    # (CCER n1*n2 cardinalities, smoothing 1.0) -> filtering(0.8, CCER
    # both-sides validity) -> cross-side pairs -> cosine matching
    # (lowercase whitespace distinct sets, round 6, > 0.35) -> connected
    # components keeping ONLY 2-element clusters; unclustered attrs
    # collapse into the appended -1 cluster.
    _SC_BASE = """sc_d1 AS MATERIALIZED (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 7 <> 0 THEN substring(text, 1, 40) END AS title,
         substring(text, 1, 120) AS body,
         'src' || ((doc_id // 2) % 10) AS site,
         lang AS lang1,
         n_chars AS nchars
  FROM documents WHERE doc_id % 2 = 0),
sc_d2 AS MATERIALIZED (
  SELECT doc_id AS rid,
         CASE WHEN doc_id % 5 <> 0 THEN substring(text, 1, 40) END AS headline,
         substring(text, 1, 120) AS content,
         'src' || ((doc_id // 2) % 10) AS domain,
         lang AS lang2,
         n_chars AS size
  FROM documents WHERE doc_id % 2 = 1),
sc_d1l AS MATERIALIZED (SELECT * FROM sc_d1 ORDER BY id LIMIT 10000),
sc_d2l AS MATERIALIZED (SELECT * FROM sc_d2 ORDER BY rid LIMIT 10000),
sc_at AS MATERIALIZED (
  SELECT 0 AS aid, 'id' AS attr, 1 AS side, coalesce(
    string_agg(coalesce(CAST(id AS VARCHAR), 'nan'), ' ' ORDER BY id), '')
    AS text FROM sc_d1l
  UNION ALL SELECT 1, 'title', 1, coalesce(
    string_agg(coalesce(title, 'nan'), ' ' ORDER BY id), '') FROM sc_d1l
  UNION ALL SELECT 2, 'body', 1, coalesce(
    string_agg(coalesce(body, 'nan'), ' ' ORDER BY id), '') FROM sc_d1l
  UNION ALL SELECT 3, 'site', 1, coalesce(
    string_agg(coalesce(site, 'nan'), ' ' ORDER BY id), '') FROM sc_d1l
  UNION ALL SELECT 4, 'lang1', 1, coalesce(
    string_agg(coalesce(lang1, 'nan'), ' ' ORDER BY id), '') FROM sc_d1l
  UNION ALL SELECT 5, 'nchars', 1, coalesce(
    string_agg(coalesce(CAST(nchars AS VARCHAR), 'nan'), ' ' ORDER BY id), '')
    FROM sc_d1l
  UNION ALL SELECT 6, 'rid', 2, coalesce(
    string_agg(coalesce(CAST(rid AS VARCHAR), 'nan'), ' ' ORDER BY rid), '')
    FROM sc_d2l
  UNION ALL SELECT 7, 'headline', 2, coalesce(
    string_agg(coalesce(headline, 'nan'), ' ' ORDER BY rid), '') FROM sc_d2l
  UNION ALL SELECT 8, 'content', 2, coalesce(
    string_agg(coalesce(content, 'nan'), ' ' ORDER BY rid), '') FROM sc_d2l
  UNION ALL SELECT 9, 'domain', 2, coalesce(
    string_agg(coalesce(domain, 'nan'), ' ' ORDER BY rid), '') FROM sc_d2l
  UNION ALL SELECT 10, 'lang2', 2, coalesce(
    string_agg(coalesce(lang2, 'nan'), ' ' ORDER BY rid), '') FROM sc_d2l
  UNION ALL SELECT 11, 'size', 2, coalesce(
    string_agg(coalesce(CAST(size AS VARCHAR), 'nan'), ' ' ORDER BY rid), '')
    FROM sc_d2l),
sc_tok AS (
  SELECT aid, side, unnest(list_distinct(list_filter(
      regexp_split_to_array(lower(text), '[\\W_]'), x -> x <> ''))) AS key
  FROM sc_at),
sc_blk AS (
  SELECT key, aid, side FROM (
    SELECT key, aid, side,
           sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY key) AS n1,
           sum(CASE WHEN side = 2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY key) AS n2
    FROM sc_tok)
  WHERE n1 >= 1 AND n2 >= 1),
sc_cards AS (
  SELECT key, count(*) AS block_size,
         (sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
          * sum(CASE WHEN side = 2 THEN 1 ELSE 0 END)) AS cardinality
  FROM sc_blk GROUP BY key),
sc_lev AS (
  SELECT cardinality, sum(block_size) AS bs, sum(cardinality) AS cc
  FROM sc_cards GROUP BY cardinality),
sc_cum AS (
  SELECT cardinality,
         sum(bs) OVER (ORDER BY cardinality) AS cum_bs,
         sum(cc) OVER (ORDER BY cardinality) AS cum_cc,
         row_number() OVER (ORDER BY cardinality) AS rn
  FROM sc_lev),
sc_cand AS (
  SELECT c.rn AS i_rn, p.cardinality AS thr_card
  FROM sc_cum c JOIN sc_cum p ON p.rn = c.rn + 1
  WHERE c.rn >= 2 AND c.cum_bs * p.cum_cc < 1.0 * c.cum_cc * p.cum_bs),
sc_thr AS (
  SELECT CASE WHEN (SELECT count(*) FROM sc_cum) <= 2 THEN 0
         ELSE coalesce((SELECT thr_card FROM sc_cand ORDER BY i_rn DESC LIMIT 1),
                       (SELECT cardinality FROM sc_cum WHERE rn = 3))
         END AS t),
sc_pp AS (
  SELECT b.key, b.aid, b.side FROM sc_blk b
  JOIN sc_cards c ON c.key = b.key, sc_thr
  WHERE c.cardinality <= sc_thr.t),
sc_fc AS (
  SELECT key, (sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
               * sum(CASE WHEN side = 2 THEN 1 ELSE 0 END)) AS cardinality
  FROM sc_pp GROUP BY key),
sc_rk AS (
  SELECT p.key, p.aid, p.side,
         row_number() OVER (PARTITION BY p.aid
                            ORDER BY c.cardinality, p.key) AS rn,
         count(*) OVER (PARTITION BY p.aid) AS n
  FROM sc_pp p JOIN sc_fc c ON c.key = p.key),
sc_fb AS (
  SELECT key, aid, side FROM (
    SELECT key, aid, side,
           sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY key) AS n1,
           sum(CASE WHEN side = 2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY key) AS n2
    FROM sc_rk WHERE rn <= floor(0.8 * n + 0.5))
  WHERE n1 >= 1 AND n2 >= 1),
sc_pairs AS (
  SELECT DISTINCT a.aid AS id1, b.aid AS id2
  FROM sc_fb a JOIN sc_fb b
    ON a.key = b.key AND a.side = 1 AND b.side = 2),
sc_wt AS (
  SELECT aid, list_sort(list_distinct(list_filter(
      regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))) AS t
  FROM sc_at),
sc_mt AS (
  SELECT id1, id2 FROM (
    SELECT p.id1, p.id2,
           round(CASE WHEN a.t = b.t THEN 1.0
                 WHEN len(a.t) = 0 OR len(b.t) = 0 THEN 0.0
                 ELSE len(list_intersect(a.t, b.t))
                      / (sqrt(CAST(len(a.t) AS DOUBLE))
                         * sqrt(CAST(len(b.t) AS DOUBLE)))
                 END, 6) AS sim
    FROM sc_pairs p JOIN sc_wt a ON a.aid = p.id1
                    JOIN sc_wt b ON b.aid = p.id2)
  WHERE sim > 0.35),
sc_bidir AS MATERIALIZED (
  SELECT id1 AS u, id2 AS v FROM sc_mt UNION SELECT id2, id1 FROM sc_mt),
sc_reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sc_bidir)
  UNION SELECT r.u, b.v FROM sc_reach r JOIN sc_bidir b ON r.v = b.u),
sc_cc AS (SELECT u AS aid, min(v) AS cluster_id FROM sc_reach GROUP BY u),
sc_sz AS (SELECT cluster_id, count(*) AS nn FROM sc_cc GROUP BY cluster_id),
sc_k AS (
  SELECT c.aid, c.cluster_id FROM sc_cc c
  JOIN sc_sz s ON s.cluster_id = c.cluster_id AND s.nn = 2),
sc_out AS MATERIALIZED (
  SELECT coalesce(k.cluster_id, -1) AS cluster_id, a.aid, a.attr, a.side
  FROM sc_at a LEFT JOIN sc_k k ON k.aid = a.aid)"""

    o["schema_clustering"] = f"""WITH RECURSIVE {_SC_BASE}
SELECT cluster_id, aid, attr, side FROM sc_out"""

    # batched per-cluster ER: qualifying clusters (both sides), row
    # membership by any-non-null cluster attribute, cluster-scoped
    # standard blocking, cosine matching > 0.7, per-cluster 2-element
    # components (bipartite edges -> both endpoint degrees 1).
    o["schema_clustered_er"] = f"""WITH RECURSIVE {_SC_BASE},
se_ok AS (
  SELECT cluster_id FROM sc_out GROUP BY cluster_id
  HAVING max(CASE WHEN side = 1 THEN 1 ELSE 0 END) = 1
     AND max(CASE WHEN side = 2 THEN 1 ELSE 0 END) = 1),
se_q AS (
  SELECT c.cluster_id, c.attr, c.side
  FROM sc_out c JOIN se_ok o ON o.cluster_id = c.cluster_id),
se_nn1 AS (
  SELECT id AS eid, 'id' AS attr FROM sc_d1 WHERE id IS NOT NULL
  UNION ALL SELECT id, 'title' FROM sc_d1 WHERE title IS NOT NULL
  UNION ALL SELECT id, 'body' FROM sc_d1 WHERE body IS NOT NULL
  UNION ALL SELECT id, 'site' FROM sc_d1 WHERE site IS NOT NULL
  UNION ALL SELECT id, 'lang1' FROM sc_d1 WHERE lang1 IS NOT NULL
  UNION ALL SELECT id, 'nchars' FROM sc_d1 WHERE nchars IS NOT NULL),
se_nn2 AS (
  SELECT rid AS eid, 'rid' AS attr FROM sc_d2 WHERE rid IS NOT NULL
  UNION ALL SELECT rid, 'headline' FROM sc_d2 WHERE headline IS NOT NULL
  UNION ALL SELECT rid, 'content' FROM sc_d2 WHERE content IS NOT NULL
  UNION ALL SELECT rid, 'domain' FROM sc_d2 WHERE domain IS NOT NULL
  UNION ALL SELECT rid, 'lang2' FROM sc_d2 WHERE lang2 IS NOT NULL
  UNION ALL SELECT rid, 'size' FROM sc_d2 WHERE size IS NOT NULL),
se_t1 AS (
  SELECT id AS eid, concat_ws(' ', coalesce(title, ''), site,
                              CAST(nchars AS VARCHAR)) AS text FROM sc_d1),
se_t2 AS (
  SELECT rid AS eid, concat_ws(' ', coalesce(headline, ''), domain,
                               CAST(size AS VARCHAR)) AS text FROM sc_d2),
se_md1 AS (
  SELECT DISTINCT q.cluster_id, n.eid, t.text
  FROM se_nn1 n JOIN se_q q ON q.side = 1 AND q.attr = n.attr
  JOIN se_t1 t ON t.eid = n.eid),
se_md2 AS (
  SELECT DISTINCT q.cluster_id, n.eid, t.text
  FROM se_nn2 n JOIN se_q q ON q.side = 2 AND q.attr = n.attr
  JOIN se_t2 t ON t.eid = n.eid),
se_tok AS (
  SELECT cluster_id, eid, 1 AS side, unnest(list_distinct(list_filter(
      regexp_split_to_array(lower(text), '[\\W_]'), x -> x <> ''))) AS tok
  FROM se_md1
  UNION ALL
  SELECT cluster_id, eid, 2, unnest(list_distinct(list_filter(
      regexp_split_to_array(lower(text), '[\\W_]'), x -> x <> '')))
  FROM se_md2),
se_blk AS (
  SELECT cluster_id, tok, eid, side FROM (
    SELECT cluster_id, tok, eid, side,
           sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY cluster_id, tok) AS n1,
           sum(CASE WHEN side = 2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY cluster_id, tok) AS n2
    FROM se_tok)
  WHERE n1 >= 1 AND n2 >= 1 AND n1 + n2 <= 1000),
se_pairs AS (
  SELECT DISTINCT a.cluster_id, a.eid AS id1, b.eid AS id2
  FROM se_blk a JOIN se_blk b
    ON a.cluster_id = b.cluster_id AND a.tok = b.tok
   AND a.side = 1 AND b.side = 2),
se_wt1 AS (
  SELECT cluster_id, eid, list_sort(list_distinct(list_filter(
      regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))) AS t
  FROM se_md1),
se_wt2 AS (
  SELECT cluster_id, eid, list_sort(list_distinct(list_filter(
      regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))) AS t
  FROM se_md2),
se_mt AS (
  SELECT cluster_id, id1, id2 FROM (
    SELECT p.cluster_id, p.id1, p.id2,
           round(CASE WHEN a.t = b.t THEN 1.0
                 WHEN len(a.t) = 0 OR len(b.t) = 0 THEN 0.0
                 ELSE len(list_intersect(a.t, b.t))
                      / (sqrt(CAST(len(a.t) AS DOUBLE))
                         * sqrt(CAST(len(b.t) AS DOUBLE)))
                 END, 6) AS sim
    FROM se_pairs p
    JOIN se_wt1 a ON a.cluster_id = p.cluster_id AND a.eid = p.id1
    JOIN se_wt2 b ON b.cluster_id = p.cluster_id AND b.eid = p.id2)
  WHERE sim > 0.7),
se_deg AS (
  SELECT cluster_id, node, count(*) AS d FROM (
    SELECT cluster_id, id1 AS node FROM se_mt
    UNION ALL SELECT cluster_id, id2 FROM se_mt)
  GROUP BY 1, 2)
SELECT DISTINCT m.cluster_id, m.id1, m.id2 FROM se_mt m
JOIN se_deg da ON da.cluster_id = m.cluster_id AND da.node = m.id1 AND da.d = 1
JOIN se_deg db ON db.cluster_id = m.cluster_id AND db.node = m.id2 AND db.d = 1"""

    # RDF schema clustering (ref schema/clustering.py:278-640): shared
    # CTE base = triple fixture -> predicate documents -> dirty chain
    # (SB -> purge 1.0 -> filter 0.8 -> WNP CBS -> EM cosine > 0 -> CC)
    # -> clusters incl. the appended redundant (-1). _ORD mirrors
    # schema_clustering._ORD (first-appearance key = side*2^40 + tid).
    _RDF_ORD = 1 << 40
    _RDF_BASE = f"""rdf_b AS (
  SELECT doc_id, text, lang, n_chars FROM documents WHERE doc_id < 120),
rdf_t1 AS MATERIALIZED (
  SELECT 's' || CAST(doc_id AS VARCHAR) AS subject, 'p_title' AS predicate,
         substr(text, 1, 40) AS object, doc_id * 5 + 0 AS tid
  FROM rdf_b WHERE doc_id % 2 = 0 AND doc_id % 7 <> 0
  UNION ALL SELECT 's' || CAST(doc_id AS VARCHAR), 'p_body',
         substr(text, 1, 120), doc_id * 5 + 1 FROM rdf_b WHERE doc_id % 2 = 0
  UNION ALL SELECT 's' || CAST(doc_id AS VARCHAR), 'p_site',
         'src' || CAST((doc_id // 2) % 10 AS VARCHAR), doc_id * 5 + 2
  FROM rdf_b WHERE doc_id % 2 = 0
  UNION ALL SELECT 's' || CAST(doc_id AS VARCHAR), 'p_lang', lang,
         doc_id * 5 + 3 FROM rdf_b WHERE doc_id % 2 = 0
  UNION ALL SELECT 's' || CAST(doc_id AS VARCHAR), 'p_nchars',
         CAST(n_chars AS VARCHAR), doc_id * 5 + 4
  FROM rdf_b WHERE doc_id % 2 = 0),
rdf_t2 AS MATERIALIZED (
  SELECT 's' || CAST(doc_id AS VARCHAR) AS subject, 'q_headline' AS predicate,
         substr(text, 1, 40) AS object, doc_id * 5 + 0 AS tid
  FROM rdf_b WHERE doc_id % 2 = 1 AND doc_id % 5 <> 0
  UNION ALL SELECT 's' || CAST(doc_id AS VARCHAR), 'q_content',
         substr(text, 1, 120), doc_id * 5 + 1 FROM rdf_b WHERE doc_id % 2 = 1
  UNION ALL SELECT 's' || CAST(doc_id AS VARCHAR), 'q_domain',
         'src' || CAST((doc_id // 2) % 10 AS VARCHAR), doc_id * 5 + 2
  FROM rdf_b WHERE doc_id % 2 = 1
  UNION ALL SELECT 's' || CAST(doc_id AS VARCHAR), 'p_lang', lang,
         doc_id * 5 + 3 FROM rdf_b WHERE doc_id % 2 = 1
  UNION ALL SELECT 's' || CAST(doc_id AS VARCHAR), 'q_size',
         CAST(n_chars AS VARCHAR), doc_id * 5 + 4
  FROM rdf_b WHERE doc_id % 2 = 1),
rdf_tt AS (
  SELECT subject, predicate, object, tid, 1 AS side FROM rdf_t1
  UNION ALL SELECT subject, predicate, object, tid, 2 FROM rdf_t2),
rdf_pe AS MATERIALIZED (
  SELECT CAST(row_number() OVER (
             ORDER BY min(side * {_RDF_ORD} + tid)) - 1 AS BIGINT) AS aid,
         predicate,
         string_agg(object, ' ' ORDER BY side, tid) AS text,
         CAST(max(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS in_d1,
         CAST(max(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS in_d2
  FROM rdf_tt GROUP BY predicate),
rp_tok AS (
  SELECT aid AS eid, unnest(list_distinct(list_filter(
      regexp_split_to_array(lower(text), '[\\W_]'), x -> x <> ''))) AS key
  FROM rdf_pe),
rp_sb AS (
  SELECT key, eid FROM rp_tok
  QUALIFY count(*) OVER (PARTITION BY key) >= 2),
rp_cards AS (
  SELECT key, count(*) AS block_size,
         CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS cardinality
  FROM rp_sb GROUP BY key),
rp_lev AS (
  SELECT cardinality, sum(block_size) AS bs, sum(cardinality) AS cc
  FROM rp_cards GROUP BY cardinality),
rp_cum AS (
  SELECT cardinality,
         sum(bs) OVER (ORDER BY cardinality) AS cum_bs,
         sum(cc) OVER (ORDER BY cardinality) AS cum_cc,
         row_number() OVER (ORDER BY cardinality) AS rn
  FROM rp_lev),
rp_cand AS (
  SELECT c.rn AS i_rn, p.cardinality AS thr_card
  FROM rp_cum c JOIN rp_cum p ON p.rn = c.rn + 1
  WHERE c.rn >= 2 AND c.cum_bs * p.cum_cc < 1.0 * c.cum_cc * p.cum_bs),
rp_thr AS (
  SELECT CASE WHEN (SELECT count(*) FROM rp_cum) <= 2 THEN 0
         ELSE coalesce((SELECT thr_card FROM rp_cand ORDER BY i_rn DESC LIMIT 1),
                       (SELECT cardinality FROM rp_cum WHERE rn = 3))
         END AS t),
rp_pp AS (
  SELECT s.key, s.eid FROM rp_sb s
  JOIN rp_cards c ON c.key = s.key, rp_thr
  WHERE c.cardinality <= rp_thr.t),
rp_fc AS (
  SELECT key, CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS cardinality
  FROM rp_pp GROUP BY key),
rp_rk AS (
  SELECT p.key, p.eid,
         row_number() OVER (PARTITION BY p.eid
                            ORDER BY c.cardinality, p.key) AS rn,
         count(*) OVER (PARTITION BY p.eid) AS n
  FROM rp_pp p JOIN rp_fc c ON c.key = p.key),
rp_bf AS (
  SELECT key, eid FROM rp_rk WHERE rn <= floor(0.8 * n + 0.5)
  QUALIFY count(*) OVER (PARTITION BY key) >= 2),
rp_e AS (
  SELECT a.eid AS id1, b.eid AS id2, CAST(count(*) AS DOUBLE) AS w
  FROM rp_bf a JOIN rp_bf b ON a.key = b.key AND a.eid < b.eid
  GROUP BY 1, 2),
rp_bi AS (SELECT id1 AS node, w FROM rp_e UNION ALL SELECT id2, w FROM rp_e),
rp_st AS (SELECT node, avg(w) AS s FROM rp_bi GROUP BY node),
rp_wnp AS (
  SELECT e.id1, e.id2 FROM rp_e e
  JOIN rp_st s1 ON s1.node = e.id1 JOIN rp_st s2 ON s2.node = e.id2
  WHERE e.w >= s1.s - {EPS} OR e.w >= s2.s - {EPS}),
rp_wt AS (
  SELECT aid AS eid, list_sort(list_distinct(list_filter(
      regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))) AS t
  FROM rdf_pe),
rp_mt AS (
  SELECT id1, id2 FROM (
    SELECT p.id1, p.id2,
           round(CASE WHEN a.t = b.t THEN 1.0
                 WHEN len(a.t) = 0 OR len(b.t) = 0 THEN 0.0
                 ELSE len(list_intersect(a.t, b.t))
                      / (sqrt(CAST(len(a.t) AS DOUBLE))
                         * sqrt(CAST(len(b.t) AS DOUBLE)))
                 END, 6) AS sim
    FROM rp_wnp p JOIN rp_wt a ON a.eid = p.id1
                  JOIN rp_wt b ON b.eid = p.id2)
  WHERE sim > 0.0),
rp_bidir AS MATERIALIZED (
  SELECT id1 AS u, id2 AS v FROM rp_mt UNION SELECT id2, id1 FROM rp_mt),
rp_reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM rp_bidir)
  UNION SELECT r.u, b.v FROM rp_reach r JOIN rp_bidir b ON r.v = b.u),
rp_cc AS (SELECT u AS aid, min(v) AS cluster_id FROM rp_reach GROUP BY u),
rp_out AS MATERIALIZED (
  SELECT coalesce(k.cluster_id, -1) AS cluster_id, p.aid, p.predicate,
         p.in_d1, p.in_d2
  FROM rdf_pe p LEFT JOIN rp_cc k ON k.aid = p.aid)"""

    _rdf_pe_base = _RDF_BASE.split(",\nrp_tok")[0]
    o["rdf_predicate_docs"] = f"""WITH {_rdf_pe_base}
SELECT aid, predicate, text, in_d1, in_d2 FROM rdf_pe"""

    o["rdf_predicate_clusters"] = f"""WITH RECURSIVE {_RDF_BASE}
SELECT cluster_id, aid, predicate, in_d1, in_d2 FROM rp_out"""

    # subject-ER continuation: qualifying clusters -> member triples
    # (>= 2 per side) -> subject docs (insertion-order lid, composite
    # enc identical to schema_clustering.rdf_subject_er) -> scoped SB
    # -> filter 0.2 -> WNP CBS -> per-cluster tfidf char-3gram cosine
    # > 0 -> sequential greedy 1-1 (> 0.1) in (1-w, id1, id2) order.
    o["rdf_subject_er"] = f"""WITH RECURSIVE {_RDF_BASE},
rs_ok AS (
  SELECT cluster_id FROM rp_out GROUP BY cluster_id
  HAVING max(in_d1) = 1 AND max(in_d2) = 1),
rs_cl AS (
  SELECT o.cluster_id, o.predicate, o.in_d1, o.in_d2
  FROM rp_out o JOIN rs_ok k ON k.cluster_id = o.cluster_id),
rs_mem AS MATERIALIZED (
  SELECT c.cluster_id, t.subject AS subj, t.object AS obj, t.tid AS o,
         1 AS side
  FROM rdf_t1 t JOIN rs_cl c ON c.predicate = t.predicate AND c.in_d1 = 1
  UNION ALL
  SELECT c.cluster_id, t.subject, t.object, t.tid, 2
  FROM rdf_t2 t JOIN rs_cl c ON c.predicate = t.predicate AND c.in_d2 = 1),
rs_keep AS (
  SELECT cluster_id FROM rs_mem GROUP BY cluster_id
  HAVING sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) >= 2
     AND sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) >= 2),
rs_m AS (SELECT m.* FROM rs_mem m
         JOIN rs_keep k ON k.cluster_id = m.cluster_id),
rs_subj AS (
  SELECT cluster_id, side, subj,
         string_agg(obj, ' ' ORDER BY o) AS text,
         row_number() OVER (PARTITION BY cluster_id, side
                            ORDER BY min(o)) - 1 AS lid
  FROM rs_m GROUP BY cluster_id, side, subj),
rs_enc AS MATERIALIZED (
  SELECT cluster_id, side, subj, text,
         ((cluster_id + 2) * 2 + (side - 1)) * {_RDF_ORD} + lid AS enc
  FROM rs_subj),
rs_tok AS (
  SELECT cluster_id, enc, side, unnest(list_distinct(list_filter(
      regexp_split_to_array(lower(text), '[\\W_]'), x -> x <> ''))) AS tok
  FROM rs_enc),
rs_blk AS (
  SELECT cluster_id, tok, enc, side FROM (
    SELECT cluster_id, tok, enc, side,
           sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY cluster_id, tok) AS n1,
           sum(CASE WHEN side = 2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY cluster_id, tok) AS n2
    FROM rs_tok)
  WHERE n1 >= 1 AND n2 >= 1 AND n1 + n2 <= 1000),
rs_fc AS (
  SELECT cluster_id, tok,
         (sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
          * sum(CASE WHEN side = 2 THEN 1 ELSE 0 END)) AS cardinality
  FROM rs_blk GROUP BY 1, 2),
rs_rk AS (
  SELECT b.cluster_id, b.tok, b.enc, b.side,
         row_number() OVER (PARTITION BY b.enc
                            ORDER BY c.cardinality, b.tok) AS rn,
         count(*) OVER (PARTITION BY b.enc) AS n
  FROM rs_blk b
  JOIN rs_fc c ON c.cluster_id = b.cluster_id AND c.tok = b.tok),
rs_bf AS (
  SELECT cluster_id, tok, enc, side FROM (
    SELECT cluster_id, tok, enc, side,
           sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY cluster_id, tok) AS n1,
           sum(CASE WHEN side = 2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY cluster_id, tok) AS n2
    FROM rs_rk WHERE rn <= floor(0.2 * n + 0.5))
  WHERE n1 >= 1 AND n2 >= 1),
rs_e AS (
  SELECT a.enc AS id1, b.enc AS id2, CAST(count(*) AS DOUBLE) AS w
  FROM rs_bf a JOIN rs_bf b
    ON a.cluster_id = b.cluster_id AND a.tok = b.tok
   AND a.side = 1 AND b.side = 2
  GROUP BY 1, 2),
rs_bi AS (SELECT id1 AS node, w FROM rs_e UNION ALL SELECT id2, w FROM rs_e),
rs_st AS (SELECT node, avg(w) AS s FROM rs_bi GROUP BY node),
rs_wnp AS MATERIALIZED (
  SELECT e.id1, e.id2 FROM rs_e e
  JOIN rs_st s1 ON s1.node = e.id1 JOIN rs_st s2 ON s2.node = e.id2
  WHERE e.w >= s1.s - {EPS} OR e.w >= s2.s - {EPS}),
rs_grams AS (
  SELECT cluster_id, enc AS eid, unnest(
      CASE WHEN len(text) < 3 THEN []
      ELSE list_transform(generate_series(1, len(text) - 2),
                          i -> substr(lower(text), i, 3)) END) AS term
  FROM rs_enc),
rs_dt AS (
  SELECT cluster_id, eid, term, CAST(count(*) AS DOUBLE) AS tf
  FROM rs_grams GROUP BY 1, 2, 3),
rs_nd AS (SELECT cluster_id, count(*) AS nd FROM rs_enc GROUP BY cluster_id),
rs_idf AS (
  SELECT d.cluster_id, d.term,
         ln((1.0 + n.nd) / (1.0 + count(*))) + 1.0 AS idf
  FROM rs_dt d JOIN rs_nd n ON n.cluster_id = d.cluster_id
  GROUP BY d.cluster_id, d.term, n.nd),
rs_w AS (
  SELECT d.eid, d.term, d.tf * i.idf AS w
  FROM rs_dt d
  JOIN rs_idf i ON i.cluster_id = d.cluster_id AND i.term = d.term),
rs_nrm AS (SELECT eid, sqrt(sum(w * w)) AS nrm FROM rs_w GROUP BY eid),
rs_dots AS (
  SELECT p.id1, p.id2, sum(a.w * b.w) AS dot
  FROM rs_wnp p JOIN rs_w a ON a.eid = p.id1
  JOIN rs_w b ON b.eid = p.id2 AND b.term = a.term
  GROUP BY 1, 2),
rs_mt AS MATERIALIZED (
  SELECT id1, id2, sim FROM (
    SELECT p.id1, p.id2,
           round(coalesce(d.dot, 0.0) / (n1.nrm * n2.nrm), 6) AS sim
    FROM rs_wnp p
    LEFT JOIN rs_dots d ON d.id1 = p.id1 AND d.id2 = p.id2
    JOIN rs_nrm n1 ON n1.eid = p.id1 JOIN rs_nrm n2 ON n2.eid = p.id2)
  WHERE sim > 0.0),
rs_umr AS MATERIALIZED (
  SELECT id1, id2, sim,
         row_number() OVER (ORDER BY (1.0 - sim), id1, id2) AS rn
  FROM rs_mt WHERE sim > 0.1),
rs_umg AS (
  SELECT 0 AS rn, CAST([] AS BIGINT[]) AS matched,
         CAST(NULL AS BIGINT) AS m1, CAST(NULL AS BIGINT) AS m2,
         CAST(NULL AS DOUBLE) AS mw
  UNION ALL
  SELECT r.rn,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN g.matched
              ELSE list_append(list_append(g.matched, r.id1), r.id2) END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.id1 END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.id2 END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.sim END
  FROM rs_umg g JOIN rs_umr r ON r.rn = g.rn + 1)
SELECT n1.cluster_id, n1.subj AS sid1, n2.subj AS sid2, u.mw AS weight
FROM rs_umg u
JOIN rs_enc n1 ON n1.enc = u.m1
JOIN rs_enc n2 ON n2.enc = u.m2
WHERE u.m1 IS NOT NULL"""

    # repetition stats: one units stream (lines / paragraphs / word
    # n-grams), per-unit counts, per-kind aggregates, conditional-agg
    # pivot — mirrors the Spark plan 1:1. Top-ngram tie-break = max
    # count then max char length, via lexicographic struct max in BOTH
    # engines.
    ngram_legs = "\n".join(
        f"""  UNION ALL
  SELECT doc_id, '{n}gram',
         unnest(CASE WHEN len(tl) >= {n} THEN
           list_transform(generate_series(1, len(tl) - {n} + 1),
                          i -> array_to_string(tl[i:i+{n}-1], ' '))
         ELSE [] END) FROM prep"""
        for n in (2, 3, 4, 5, 10))
    frac_cols = []
    for kind, num, den, name in [
            ("line", "dup_occ", "tot_occ", "dup_line_frac"),
            ("line", "dup_chars", "tot_chars", "dup_line_char_frac"),
            ("para", "dup_occ", "tot_occ", "dup_para_frac"),
            ("2gram", "top.cnt * top.ulen", "tot_chars", "top2gram_char_frac"),
            ("3gram", "top.cnt * top.ulen", "tot_chars", "top3gram_char_frac"),
            ("4gram", "top.cnt * top.ulen", "tot_chars", "top4gram_char_frac"),
            ("5gram", "dup_chars", "tot_chars", "dup5gram_char_frac"),
            ("10gram", "dup_chars", "tot_chars", "dup10gram_char_frac")]:
        frac_cols.append(
            f"    round(coalesce(max(CASE WHEN kind = '{kind}' THEN"
            f" ({num}) * 1.0 / {den} END), 0.0), 6) AS {name}")
    o["repetition_stats"] = f"""WITH base AS (
  SELECT doc_id,
         replace(replace(text, ' of ', chr(10) || chr(10)),
                 ' the ', chr(10)) AS text
  FROM documents),
prep AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                     x -> x <> '') AS tl,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)), x -> x <> '') AS ll,
         list_filter(list_transform(regexp_split_to_array(text,
                                    '\\n{{2,}}'), x -> trim(x)),
                     x -> x <> '') AS pl
  FROM base),
units AS (
  SELECT doc_id, 'line' AS kind, unnest(ll) AS unit FROM prep
  UNION ALL
  SELECT doc_id, 'para', unnest(pl) FROM prep
{ngram_legs}),
per_unit AS (
  SELECT doc_id, kind, unit, count(*) AS cnt FROM units GROUP BY 1, 2, 3),
per_kind AS (
  SELECT doc_id, kind,
         sum(cnt) AS tot_occ,
         sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS dup_occ,
         sum(cnt * length(unit)) AS tot_chars,
         sum(CASE WHEN cnt > 1 THEN (cnt - 1) * length(unit)
             ELSE 0 END) AS dup_chars,
         max(struct_pack(cnt := cnt, ulen := length(unit))) AS top
  FROM per_unit GROUP BY 1, 2),
pv AS (
  SELECT doc_id,
{",".join(frac_cols)}
  FROM per_kind GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(pv.dup_line_frac, 0.0) AS dup_line_frac,
       coalesce(pv.dup_line_char_frac, 0.0) AS dup_line_char_frac,
       coalesce(pv.dup_para_frac, 0.0) AS dup_para_frac,
       coalesce(pv.top2gram_char_frac, 0.0) AS top2gram_char_frac,
       coalesce(pv.top3gram_char_frac, 0.0) AS top3gram_char_frac,
       coalesce(pv.top4gram_char_frac, 0.0) AS top4gram_char_frac,
       coalesce(pv.dup5gram_char_frac, 0.0) AS dup5gram_char_frac,
       coalesce(pv.dup10gram_char_frac, 0.0) AS dup10gram_char_frac
FROM documents d LEFT JOIN pv ON pv.doc_id = d.doc_id"""

    o["source_stats"] = """WITH d AS (
  SELECT source, doc_id,
         md5(lower(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))) AS fingerprint,
         len(text) AS l
  FROM documents),
fc AS (SELECT fingerprint, count(*) AS c FROM d GROUP BY fingerprint)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(CASE WHEN fc.c > 1 THEN 1.0 ELSE 0.0 END), 6) AS dup_frac,
       round(avg(d.l), 6) AS avg_len
FROM d JOIN fc ON fc.fingerprint = d.fingerprint
GROUP BY d.source"""

    o["events_windowed"] = """SELECT
  time_bucket(INTERVAL '1 hour', ts) AS window_start,
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""

    o["token_count"] = """SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                       x -> x <> '')) AS n_tokens,
       len(list_distinct(list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                         x -> x <> ''))) AS n_unique_tokens,
       len(text) AS n_chars
FROM documents"""

    _cos = ("list_dot_product(a.v, b.v) / "
            "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))")
    o["ann_brute_topk"] = f"""WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       round({_cos}, 6) AS cosine,
       row_number() OVER (PARTITION BY a.vec_id
                          ORDER BY round({_cos}, 6) DESC, b.vec_id) AS rank
FROM v a JOIN v b ON a.vec_id <> b.vec_id
WHERE a.vec_id < 20
QUALIFY rank <= 10"""

    def _banded_cte(n_bands: int, band_bits: int) -> str:
        """vb(vec_id, band, bucket) from the SAME deterministic sparse
        Rademacher family as functions/vectors.band_bucket_exprs —
        left-associated double sums, so buckets match Spark bit-exactly."""
        from .functions.vectors import DEFAULT_PLANE_NNZ, band_bucket_sql

        bands = band_bucket_sql("v", 64, n_bands, band_bits,
                                DEFAULT_PLANE_NNZ)
        selects = [
            f"SELECT vec_id, {b} AS band, {sql} AS bucket FROM v"
            for b, sql in enumerate(bands)
        ]
        return "vb AS (\n  " + "\n  UNION ALL ".join(selects) + ")"

    _EMB_V = "v AS (\n  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"

    # text -> embedding: the hashing-trick encoder's SQL twin. Cell
    # values are +/-1 count sums (exact integers in double, order-proof);
    # the l2 norm is a sum of integer squares — bit-identical to Spark.
    _TXT_V = """tg AS (
  SELECT vec_id, g FROM (
    SELECT doc_id AS vec_id,
           unnest(CASE WHEN len(lower(text)) < 3 THEN []
                  ELSE list_transform(range(1, len(lower(text)) - 1),
                       i -> substr(lower(text), i, 3)) END) AS g
    FROM documents)),
hh AS (
  SELECT vec_id, CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) AS h
  FROM tg),
cellv AS (
  SELECT vec_id, CAST(h % 64 AS INT) AS idx,
         sum(CASE WHEN (h // 64) % 2 = 0 THEN 1.0 ELSE -1.0 END) AS val
  FROM hh GROUP BY 1, 2),
gridv AS (
  SELECT d.doc_id AS vec_id, gs.i AS idx
  FROM documents d CROSS JOIN (SELECT unnest(range(0, 64)) AS i) gs),
densev AS (
  SELECT g.vec_id, list(coalesce(c.val, 0.0) ORDER BY g.idx) AS rawv
  FROM gridv g LEFT JOIN cellv c ON c.vec_id = g.vec_id AND c.idx = g.idx
  GROUP BY g.vec_id),
v AS MATERIALIZED (
  SELECT vec_id,
         CASE WHEN sqrt(list_sum(list_transform(rawv, x -> x * x))) = 0
              THEN rawv
              ELSE list_transform(rawv, x ->
                   x / sqrt(list_sum(list_transform(rawv, y -> y * y))))
         END AS v
  FROM densev)"""

    def _lsh_topk_sql(n_bands: int, band_bits: int,
                      v_cte: str = _EMB_V) -> str:
        return f"""WITH {v_cte},
{_banded_cte(n_bands, band_bits)},
cand AS (
  SELECT DISTINCT x.vec_id AS qid, y.vec_id AS nid
  FROM vb x JOIN vb y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.vec_id <> y.vec_id)
SELECT c.qid AS query_id, c.nid AS neighbor_id,
       round({_cos}, 6) AS cosine,
       row_number() OVER (PARTITION BY c.qid
                          ORDER BY round({_cos}, 6) DESC, c.nid) AS rank
FROM cand c JOIN v a ON a.vec_id = c.qid JOIN v b ON b.vec_id = c.nid
QUALIFY rank <= 10"""

    # IVF-flat twin: centroids are every step-th id (step = ceil(N/16)),
    # assignment = argmax rounded cosine (centroid-id tie-break), probe
    # the 2 nearest cells, exact rerank inside — mirrors vectors.ivf_topk
    # decision-for-decision on the rounded values.
    _cos_ac = ("list_dot_product(a.v, c.c) / "
               "(sqrt(list_dot_product(a.v, a.v)) * "
               "sqrt(list_dot_product(c.c, c.c)))")
    o["ann_ivf_topk"] = f"""WITH {_EMB_V},
par AS (SELECT CAST((count(*) + 15) // 16 AS BIGINT) AS step FROM v),
cents AS (
  SELECT vec_id AS cid, v AS c FROM v, par WHERE vec_id % step = 0),
ranked AS MATERIALIZED (
  SELECT a.vec_id AS id, c.cid,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_cos_ac}, 6) DESC, c.cid)
           AS r
  FROM v a CROSS JOIN cents c),
assign AS (SELECT id AS neighbor_id, cid AS cell FROM ranked WHERE r = 1),
probes AS (SELECT id AS query_id, cid AS cell FROM ranked WHERE r <= 2),
cand AS (
  SELECT DISTINCT p.query_id, s.neighbor_id
  FROM probes p JOIN assign s USING (cell)
  WHERE p.query_id <> s.neighbor_id)
SELECT c.query_id, c.neighbor_id, round({_cos}, 6) AS cosine,
       row_number() OVER (PARTITION BY c.query_id
                          ORDER BY round({_cos}, 6) DESC, c.neighbor_id)
         AS rank
FROM cand c JOIN v a ON a.vec_id = c.query_id
            JOIN v b ON b.vec_id = c.neighbor_id
QUALIFY rank <= 10"""

    o["ann_topk"] = _lsh_topk_sql(4, 16)
    o["ann_lsh_topk"] = _lsh_topk_sql(2, 12)
    o["ann_topk_from_text"] = _lsh_topk_sql(4, 16, v_cte=_TXT_V)

    o["embedding_dedup"] = f"""WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_banded_cte(4, 16)},
cand AS (
  SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
  FROM vb x JOIN vb y ON x.band = y.band AND x.bucket = y.bucket
  WHERE x.vec_id < y.vec_id)
SELECT id1, id2, cosine FROM (
  SELECT c.id1, c.id2, round({_cos}, 6) AS cosine
  FROM cand c JOIN v a ON a.vec_id = c.id1 JOIN v b ON b.vec_id = c.id2)
WHERE cosine >= 0.42"""

    # ---------------- blocking-key families (q / suffix / substring = 4)

    _tok_cte = """tk AS (
  SELECT doc_id AS eid,
         unnest(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '[\\W_]'), x -> x <> ''))) AS t
  FROM documents)"""

    def _family(keys_expr: str, min_b: int = 2, max_b: int | None = None) -> str:
        cap = f"AND cnt <= {max_b}" if max_b else ""
        return f"""WITH {_tok_cte},
ks AS (
  SELECT eid, key FROM (SELECT eid, unnest({keys_expr}) AS key FROM tk)
  GROUP BY eid, key),
sized AS (
  SELECT key, eid, count(*) OVER (PARTITION BY key) AS cnt FROM ks)
SELECT key, count(*) AS block_size FROM sized
WHERE cnt >= {min_b} {cap} GROUP BY key"""

    o["qgrams_blocking"] = _family(
        """CASE WHEN len(t) < 4 THEN [t]
        ELSE list_transform(range(1, len(t) - 4 + 2), i -> substring(t, i, 4))
        END""")

    o["suffix_blocking"] = _family(
        """CASE WHEN len(t) < 4 THEN [t]
        ELSE list_transform(range(1, len(t) - 4 + 2),
                            i -> substring(t, i, len(t) - i + 1))
        END""", 2, 53)

    o["ext_suffix_blocking"] = _family(
        """CASE WHEN len(t) < 4 THEN [t]
        ELSE flatten(list_transform(range(1, least(len(t), 24) - 4 + 2),
             i -> list_transform(range(4, least(len(t), 24) - i + 2),
                                 L -> substring(t, i, L))))
        END""", 2, 39)

    o["ext_qgrams_blocking"] = f"""WITH {_tok_cte},
gr AS (
  SELECT eid, t,
         CASE WHEN len(t) <= 4 THEN NULL
         ELSE list_slice(list_transform(range(1, len(t) - 4 + 2),
                                        i -> substring(t, i, 4)), 1, 15)
         END AS g
  FROM tk),
ks AS (
  SELECT eid, key FROM (
    SELECT eid, unnest(CASE WHEN g IS NULL THEN [t]
        ELSE list_concat([array_to_string(g, '')],
             list_transform(range(1, len(g) + 1),
                 i -> coalesce(array_to_string(list_slice(g, 1, i - 1), ''), '')
                      || coalesce(array_to_string(list_slice(g, i + 1, len(g)),
                                                  ''), '')))
        END) AS key
    FROM gr)
  GROUP BY eid, key),
sized AS (SELECT key, eid, count(*) OVER (PARTITION BY key) AS cnt FROM ks)
SELECT key, count(*) AS block_size FROM sized WHERE cnt >= 2 GROUP BY key"""

    # ---------------- sorted neighborhood (PSN), window = 3

    _psn = f"""{SB},
pos AS (
  SELECT row_number() OVER (ORDER BY key, eid) - 1 AS pos, eid FROM sb),
np AS (SELECT eid, count(*) AS np FROM pos GROUP BY eid),
offs AS (SELECT unnest(range(1, 4)) AS w),
co AS (
  SELECT least(a.eid, b.eid) AS id1, greatest(a.eid, b.eid) AS id2, o.w AS w
  FROM pos a CROSS JOIN offs o JOIN pos b ON b.pos = a.pos + o.w
  WHERE a.eid <> b.eid)"""

    o["gpsn_acf"] = f"""WITH {_psn}
SELECT id1, id2, round(CAST(count(*) AS DOUBLE), 6) AS weight
FROM co GROUP BY 1, 2"""

    o["gpsn_id"] = f"""WITH {_psn}
SELECT id1, id2, round(sum(1.0 / w), 6) AS weight FROM co GROUP BY 1, 2"""

    o["lpsn_ncf"] = f"""WITH {_psn},
pw AS (SELECT id1, id2, w, CAST(count(*) AS DOUBLE) AS c
       FROM co GROUP BY 1, 2, 3),
wt AS (SELECT p.id1, p.id2, p.c / (n1.np + n2.np - p.c) AS wt
       FROM pw p JOIN np n1 ON n1.eid = p.id1 JOIN np n2 ON n2.eid = p.id2)
SELECT id1, id2, round(max(wt), 6) AS weight FROM wt GROUP BY 1, 2"""

    # ---------------- progressive emission

    o["pcep_topk"] = f"""WITH {SB},
{_edges_sql('sb', 'JS')}
SELECT id1, id2, round(w, 6) AS weight,
       row_number() OVER (ORDER BY w DESC, id1, id2) AS emit_rank
FROM e QUALIFY emit_rank <= 500"""

    o["pcnp_dfs"] = f"""WITH {SB},
{_cnp_sql('sb', 'cnp', 'CBS')},
nb AS (SELECT id1, avg(weight) AS a FROM cnp GROUP BY id1),
nbr AS (SELECT id1, row_number() OVER (ORDER BY a DESC, id1) AS nb_rank FROM nb),
wr AS (
  SELECT c.id1, c.id2, c.weight, nbr.nb_rank,
         row_number() OVER (PARTITION BY c.id1
                            ORDER BY c.weight DESC, c.id2) AS within_rank
  FROM cnp c JOIN nbr ON nbr.id1 = c.id1)
SELECT id1, id2, round(weight, 6) AS weight,
       row_number() OVER (ORDER BY nb_rank, within_rank) AS emit_rank
FROM wr QUALIFY emit_rank <= 500"""

    o["random_pm"] = f"""WITH {SB},
pairs AS (
  SELECT DISTINCT a.eid AS id1, b.eid AS id2
  FROM sb a JOIN sb b ON a.key = b.key AND a.eid < b.eid)
SELECT id1, id2,
       row_number() OVER (
           ORDER BY md5(CAST(id1 AS VARCHAR) || '-' || CAST(id2 AS VARCHAR)),
                    id1, id2) AS emit_rank
FROM pairs QUALIFY emit_rank <= 200"""

    o["pes_hb"] = f"""WITH {SB},
{_edges_sql('sb', 'CBS')},
nb AS (SELECT id1, avg(w) AS a FROM e GROUP BY id1),
nbr AS (SELECT id1, row_number() OVER (ORDER BY a DESC, id1) AS nb_rank FROM nb),
wr AS (
  SELECT c.id1, c.id2, c.w, nbr.nb_rank,
         row_number() OVER (PARTITION BY c.id1
                            ORDER BY c.w DESC, c.id2) AS within_rank
  FROM e c JOIN nbr ON nbr.id1 = c.id1)
SELECT id1, id2, round(w, 6) AS weight,
       row_number() OVER (ORDER BY (within_rank > 1), nb_rank, within_rank)
           AS emit_rank
FROM wr QUALIFY emit_rank <= 300"""

    # progressive cumulative recall / AUC: PES(HB) emissions joined to
    # the exact 3-shingle-jaccard GT, running-sum window over emit_rank
    _PROG_BASE = f"""{SB},
{_edges_sql('sb', 'CBS')},
pnb AS (SELECT id1, avg(w) AS a FROM e GROUP BY id1),
pnbr AS (SELECT id1, row_number() OVER (ORDER BY a DESC, id1) AS nb_rank FROM pnb),
pwr AS (
  SELECT c.id1, c.id2, c.w, pnbr.nb_rank,
         row_number() OVER (PARTITION BY c.id1
                            ORDER BY c.w DESC, c.id2) AS within_rank
  FROM e c JOIN pnbr ON pnbr.id1 = c.id1),
pemit AS (
  SELECT id1, id2, emit_rank FROM (
    SELECT id1, id2,
           row_number() OVER (ORDER BY (within_rank > 1), nb_rank,
                              within_rank) AS emit_rank
    FROM pwr)
  WHERE emit_rank <= 300),
pt AS (
  SELECT doc_id AS eid,
         list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                     x -> x <> '') AS tl
  FROM documents),
psh AS (
  SELECT eid, CASE WHEN len(tl) < 3 THEN []
         ELSE list_distinct(list_transform(range(1, len(tl) - 3 + 2),
              i -> array_to_string(list_slice(tl, i, i + 2), ' '))) END AS sl
  FROM pt),
pex AS (SELECT eid, unnest(sl) AS g FROM psh),
pgt AS (
  SELECT id1, id2 FROM (
    SELECT c.id1, c.id2,
           round(c.c * 1.0 / (len(x.sl) + len(y.sl) - c.c), 6) AS j
    FROM (SELECT a.eid AS id1, b.eid AS id2, count(*) AS c
          FROM pex a JOIN pex b ON a.g = b.g AND a.eid < b.eid
          GROUP BY 1, 2) c
    JOIN psh x ON x.eid = c.id1 JOIN psh y ON y.eid = c.id2)
  WHERE j >= 0.5),
ptot AS (SELECT count(*) AS t FROM pgt),
pcurve AS (
  SELECT e.emit_rank,
         CAST(sum(CASE WHEN g.id1 IS NOT NULL THEN 1 ELSE 0 END)
              OVER (ORDER BY e.emit_rank) AS BIGINT) AS cum_tps
  FROM pemit e LEFT JOIN pgt g ON g.id1 = e.id1 AND g.id2 = e.id2)"""

    o["progressive_recall"] = f"""WITH {_PROG_BASE}
SELECT emit_rank, cum_tps,
       round(cum_tps * 1.0 / (SELECT t FROM ptot), 6) AS cum_recall
FROM pcurve"""

    o["progressive_auc"] = f"""WITH {_PROG_BASE}
SELECT CAST(count(*) AS BIGINT) AS total_emissions,
       CAST(max(cum_tps) AS BIGINT) AS tps_found,
       round(sum(round(cum_tps * 1.0 / (SELECT t FROM ptot), 9))
             / (count(*) + 1.0), 6) AS auc
FROM pcurve"""

    o["meta_cnp_cleaned"] = f"""WITH {SB},
{_purging_sql('sb', 1.0, 'pp')},
{_filtering_sql('pp', 0.8, 'bf', 'bfc')},
{_cnp_sql('bf', 'cnp', 'JS')}
SELECT id1, id2, round(weight, 6) AS weight FROM cnp"""

    # ---------------- matching metric variants (on CNP(JS) candidates)

    def _matching_set_metric_sql(body: str, threshold: float) -> str:
        return f"""WITH {SB},
{_cnp_sql('sb', 'cnp', 'JS')},
mt_wt AS (
  SELECT doc_id AS eid,
         list_sort(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))) AS t
  FROM documents),
scored AS (
  SELECT p.id1, p.id2,
         round(CASE WHEN a.t = b.t THEN 1.0
               WHEN len(a.t) = 0 OR len(b.t) = 0 THEN 0.0
               ELSE {body}
               END, 6) AS sim
  FROM cnp p JOIN mt_wt a ON a.eid = p.id1 JOIN mt_wt b ON b.eid = p.id2)
SELECT id1, id2, sim FROM scored WHERE sim > {threshold}"""

    _i = "len(list_intersect(a.t, b.t))"
    o["em_dice"] = _matching_set_metric_sql(
        f"2.0 * {_i} / (len(a.t) + len(b.t))", 0.4)
    o["em_jaccard_quirk"] = _matching_set_metric_sql(
        f"{_i} * 1.0 / (len(a.t) + len(b.t) + {_i})", 0.2)
    o["em_overlap"] = _matching_set_metric_sql(
        f"{_i} * 1.0 / least(len(a.t), len(b.t))", 0.5)

    # GeneralizedJaccard: the greedy desc-score token assignment is
    # sequential by nature -> recursive CTE walking candidates in rank
    # order, carrying used-token arrays. DuckDB's jaro_similarity is
    # bit-identical to the engine's _jaro_py kernel (verified on a
    # cross-product corpus; only ('','') differs, which tokens exclude).
    o["em_generalized_jaccard"] = f"""WITH RECURSIVE {SB},
{_cnp_sql('sb', 'cnp', 'JS')},
cnp10 AS (SELECT id1, id2 FROM cnp WHERE id1 % 40 = 0),
mt_wt AS (
  SELECT doc_id AS eid,
         list_sort(list_distinct(list_filter(
             regexp_split_to_array(lower(substr(text, 1, 60)), '\\s+'),
             x -> x <> ''))) AS t
  FROM documents),
tp AS (
  SELECT p.id1, p.id2, x.t1, y.t2, jaro_similarity(x.t1, y.t2) AS s
  FROM cnp10 p
  JOIN (SELECT eid, unnest(t) AS t1 FROM mt_wt) x ON x.eid = p.id1
  JOIN (SELECT eid, unnest(t) AS t2 FROM mt_wt) y ON y.eid = p.id2
  WHERE jaro_similarity(x.t1, y.t2) > 0.5),
rk AS MATERIALIZED (
  SELECT id1, id2, t1, t2, s,
         row_number() OVER (PARTITION BY id1, id2
                            ORDER BY s DESC, t1, t2) AS rn
  FROM tp),
g AS (
  SELECT id1, id2, 0 AS rn,
         CAST([] AS VARCHAR[]) AS u1, CAST([] AS VARCHAR[]) AS u2,
         CAST(0.0 AS DOUBLE) AS total, 0 AS k
  FROM (SELECT DISTINCT id1, id2 FROM rk)
  UNION ALL
  SELECT g.id1, g.id2, c.rn,
         CASE WHEN NOT list_contains(g.u1, c.t1)
               AND NOT list_contains(g.u2, c.t2)
              THEN list_append(g.u1, c.t1) ELSE g.u1 END,
         CASE WHEN NOT list_contains(g.u1, c.t1)
               AND NOT list_contains(g.u2, c.t2)
              THEN list_append(g.u2, c.t2) ELSE g.u2 END,
         g.total + CASE WHEN NOT list_contains(g.u1, c.t1)
                         AND NOT list_contains(g.u2, c.t2)
                        THEN c.s ELSE 0.0 END,
         g.k + CASE WHEN NOT list_contains(g.u1, c.t1)
                     AND NOT list_contains(g.u2, c.t2)
                    THEN 1 ELSE 0 END
  FROM g JOIN rk c ON c.id1 = g.id1 AND c.id2 = g.id2 AND c.rn = g.rn + 1),
gj AS (
  SELECT id1, id2, total, k FROM (
    SELECT id1, id2, total, k,
           row_number() OVER (PARTITION BY id1, id2 ORDER BY rn DESC) AS rr
    FROM g)
  WHERE rr = 1),
gscored AS (
  SELECT p.id1, p.id2,
         round(CASE WHEN a.t = b.t THEN 1.0
               WHEN len(a.t) = 0 OR len(b.t) = 0 THEN 0.0
               ELSE coalesce(gj.total, 0.0)
                    / (len(a.t) + len(b.t) - coalesce(gj.k, 0))
               END, 6) AS sim
  FROM cnp10 p
  JOIN mt_wt a ON a.eid = p.id1 JOIN mt_wt b ON b.eid = p.id2
  LEFT JOIN gj ON gj.id1 = p.id1 AND gj.id2 = p.id2)
SELECT id1, id2, sim FROM gscored WHERE sim > 0.3"""

    def _matching_string_metric_sql(body: str, threshold: float) -> str:
        return f"""WITH {SB},
{_cnp_sql('sb', 'cnp', 'JS')},
lv AS (SELECT doc_id AS eid, lower(text) AS s FROM documents),
scored AS (
  SELECT p.id1, p.id2,
         round(CASE WHEN a.s = b.s THEN 1.0 ELSE {body} END, 6) AS sim
  FROM cnp p JOIN lv a ON a.eid = p.id1 JOIN lv b ON b.eid = p.id2)
SELECT id1, id2, sim FROM scored WHERE sim > {threshold}"""

    o["em_levenshtein"] = _matching_string_metric_sql(
        "1.0 - levenshtein(a.s, b.s) * 1.0 / greatest(len(a.s), len(b.s))", 0.3)
    o["em_jaro"] = _matching_string_metric_sql(
        "jaro_similarity(a.s, b.s)", 0.5)

    def _vectorizer_cosine_sql(w_cte: str) -> str:
        return f"""WITH {SB},
{_cnp_sql('sb', 'cnp', 'JS')},
tw AS (
  SELECT doc_id AS eid,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS term
  FROM documents),
dt AS (SELECT eid, term, CAST(count(*) AS DOUBLE) AS tf FROM tw GROUP BY 1, 2),
{w_cte},
nrm AS (SELECT eid, sqrt(sum(w * w)) AS nrm FROM wv GROUP BY eid),
dots AS (
  SELECT p.id1, p.id2, sum(a.w * b.w) AS dot
  FROM cnp p JOIN wv a ON a.eid = p.id1
  JOIN wv b ON b.eid = p.id2 AND b.term = a.term
  GROUP BY 1, 2),
scored AS (
  SELECT p.id1, p.id2,
         round(coalesce(d.dot, 0.0) / (n1.nrm * n2.nrm), 6) AS sim
  FROM cnp p
  LEFT JOIN dots d ON d.id1 = p.id1 AND d.id2 = p.id2
  JOIN nrm n1 ON n1.eid = p.id1 JOIN nrm n2 ON n2.eid = p.id2)
SELECT id1, id2, sim FROM scored WHERE sim > 0.3"""

    o["tfidf_cosine"] = _vectorizer_cosine_sql("""idf AS (
  SELECT term,
         ln((1.0 + (SELECT count(*) FROM documents)) / (1.0 + count(*))) + 1.0
             AS idf
  FROM dt GROUP BY term),
wv AS (SELECT eid, term, tf * idf AS w FROM dt JOIN idf USING (term))""")
    o["tf_cosine"] = _vectorizer_cosine_sql(
        "wv AS (SELECT eid, term, tf AS w FROM dt)")
    o["boolean_cosine"] = _vectorizer_cosine_sql(
        "wv AS (SELECT eid, term, 1.0 AS w FROM dt)")

    stop_arr = "[" + ", ".join(
        "'" + w.replace("'", "''") + "'" for w in TXT.NLTK_EN_STOPWORDS) + "]"
    o["clean_text"] = f"""SELECT doc_id,
       array_to_string(list_filter(regexp_split_to_array(
           regexp_replace(regexp_replace(regexp_replace(lower(text),
               '\\d+', '', 'g'), '[^\\x00-\\x7F]+', '', 'g'),
               '[^\\w\\s]', '', 'g'),
           '\\s+'),
           x -> x <> '' AND NOT list_contains({stop_arr}, x)), ' ') AS cleaned
FROM documents"""

    o["lsh_recall_eval"] = f"""WITH {_tokhash_sql(3)},
{_minhash_sig_sql(32)},
{_bands_sql(8, 4)},
pred AS (
  SELECT DISTINCT a.eid AS id1, b.eid AS id2
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.eid < b.eid),
ex3 AS (SELECT eid, unnest(sl) AS g FROM hx),
common3 AS (
  SELECT a.eid AS id1, b.eid AS id2, count(*) AS c
  FROM ex3 a JOIN ex3 b ON a.g = b.g AND a.eid < b.eid
  GROUP BY 1, 2),
gt AS (
  SELECT id1, id2 FROM (
    SELECT c.id1, c.id2,
           round(c.c * 1.0 / (len(x.sl) + len(y.sl) - c.c), 6) AS jaccard
    FROM common3 c JOIN hx x ON x.eid = c.id1 JOIN hx y ON y.eid = c.id2)
  WHERE jaccard >= 0.5),
cnts AS (
  SELECT (SELECT count(*) FROM pred p JOIN gt g
          ON g.id1 = p.id1 AND g.id2 = p.id2) AS tp,
         (SELECT count(*) FROM pred) AS np,
         (SELECT count(*) FROM gt) AS ng)
SELECT tp, np - tp AS fp, ng - tp AS fn,
       round(CASE WHEN np > 0 THEN tp * 1.0 / np ELSE 0.0 END, 6) AS prec,
       round(CASE WHEN ng > 0 THEN tp * 1.0 / ng ELSE 0.0 END, 6) AS recall,
       round(CASE WHEN tp > 0 THEN
             2.0 * (tp * 1.0 / np) * (tp * 1.0 / ng)
             / (tp * 1.0 / np + tp * 1.0 / ng) ELSE 0.0 END, 6) AS f1
FROM cnts"""

    o["ejoin_dice_multiset"] = """WITH tkm AS (
  SELECT doc_id AS eid,
         unnest(list_filter(regexp_split_to_array(lower(text), '[\\W_]'),
                            x -> x <> '')) AS tok
  FROM documents),
cnts AS (SELECT eid, tok, count(*) AS k FROM tkm GROUP BY 1, 2),
ms AS (
  SELECT eid, tok || CAST(i AS VARCHAR) AS tok
  FROM (SELECT eid, tok, unnest(range(0, k)) AS i FROM cnts)),
fz AS (SELECT eid, count(*) AS f FROM ms GROUP BY eid),
jc AS (
  SELECT a.eid AS id1, b.eid AS id2, count(*) AS c
  FROM ms a JOIN ms b ON a.tok = b.tok AND a.eid < b.eid
  GROUP BY 1, 2)
SELECT id1, id2, sim FROM (
  SELECT j.id1, j.id2,
         round(2.0 * j.c / (f1.f + f2.f), 6) AS sim
  FROM jc j JOIN fz f1 ON f1.eid = j.id1 JOIN fz f2 ON f2.eid = j.id2)
WHERE sim >= 0.8"""

    o["ejoin_jaccard_qgrams"] = """WITH s0 AS (
  SELECT doc_id AS eid, lower(text) AS s FROM documents),
cg AS (
  SELECT eid, CASE WHEN len(s) < 3 THEN []
         ELSE list_distinct(list_transform(range(1, len(s) - 3 + 2),
                                           i -> substring(s, i, 3)))
         END AS gl
  FROM s0),
fz AS (SELECT eid, len(gl) AS f FROM cg),
ex AS (SELECT eid, unnest(gl) AS g FROM cg),
jc AS (
  SELECT a.eid AS id1, b.eid AS id2, count(*) AS c
  FROM ex a JOIN ex b ON a.g = b.g AND a.eid < b.eid
  GROUP BY 1, 2)
SELECT id1, id2, sim FROM (
  SELECT j.id1, j.id2,
         round(j.c * 1.0 / (f1.f + f2.f - j.c), 6) AS sim
  FROM jc j JOIN fz f1 ON f1.eid = j.id1 JOIN fz f2 ON f2.eid = j.id2)
WHERE sim >= 0.95"""

    o["embeddings_nn_bpm"] = f"""WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
nn AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         round({_cos}, 6) AS w,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY round({_cos}, 6) DESC, b.vec_id) AS rank
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 20
  QUALIFY rank <= 10),
nb AS (SELECT id1, avg(w) AS a FROM nn GROUP BY id1),
nbr AS (SELECT id1, row_number() OVER (ORDER BY a DESC, id1) AS nb_rank FROM nb),
wr AS (
  SELECT e.id1, e.id2, e.w, nbr.nb_rank,
         row_number() OVER (PARTITION BY e.id1
                            ORDER BY e.w DESC, e.id2) AS within_rank
  FROM nn e JOIN nbr ON nbr.id1 = e.id1)
SELECT id1, id2, round(w, 6) AS weight,
       row_number() OVER (ORDER BY (within_rank > 1), nb_rank, within_rank)
           AS emit_rank
FROM wr QUALIFY emit_rank <= 100"""

    o["topk_join_pm"] = f"""WITH {_jointoks},
s AS (
  SELECT id2 AS id1, id1 AS id2,
         round(c / (sqrt(CAST(f1 AS DOUBLE) * f2)), 6) AS w
  FROM jc
  QUALIFY row_number() OVER (PARTITION BY id2
                             ORDER BY round(c / (sqrt(CAST(f1 AS DOUBLE) * f2)), 6)
                                 DESC, id1) <= 5)
SELECT id1, id2, w AS weight,
       row_number() OVER (ORDER BY w DESC, id1, id2) AS emit_rank
FROM s QUALIFY emit_rank <= 200"""

    # ---------------- Clean-Clean ER (even/odd doc_id split)

    _CTOK = """ctok AS (
  SELECT doc_id AS eid, CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS side,
         unnest(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '[\\W_]'), x -> x <> ''))) AS key
  FROM documents),
cblk AS (
  SELECT key, eid, side FROM (
    SELECT key, eid, side,
           sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY key) AS n1,
           sum(CASE WHEN side = 2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY key) AS n2
    FROM ctok)
  WHERE n1 >= 1 AND n2 >= 1)"""

    o["ccer_blocks"] = f"""WITH {_CTOK}
SELECT key,
       CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       CAST(sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
FROM cblk GROUP BY key"""

    o["ccer_pairs_cp"] = f"""WITH {_CTOK}
SELECT DISTINCT a.eid AS id1, b.eid AS id2
FROM cblk a JOIN cblk b ON a.key = b.key AND a.side = 1 AND b.side = 2"""

    _CWEP = f"""{_CTOK},
cnb AS (SELECT eid, count(*) AS nb FROM cblk GROUP BY eid),
ce_raw AS (
  SELECT a.eid AS id1, b.eid AS id2, count(*) AS cbs
  FROM cblk a JOIN cblk b ON a.key = b.key AND a.side = 1 AND b.side = 2
  GROUP BY 1, 2),
ce AS (
  SELECT r.id1, r.id2,
         CAST(r.cbs AS DOUBLE) / (n1.nb + n2.nb - r.cbs) AS w
  FROM ce_raw r JOIN cnb n1 ON n1.eid = r.id1 JOIN cnb n2 ON n2.eid = r.id2),
cwep AS (
  SELECT id1, id2, w FROM ce
  WHERE w >= (SELECT avg(w) FROM ce) - {EPS})"""

    o["ccer_wep_js"] = f"""WITH {_CWEP}
SELECT id1, id2, round(w, 6) AS weight FROM cwep"""

    # shared CCER edge scaffolding: per-block side counts, per-entity
    # block counts, distinct D1 x D2 pairs with the CBS / CN / SN
    # counters (the CN quirk: 1/card accumulated AND +1 per block)
    _CED = f"""{_CTOK},
ckst AS (
  SELECT key,
         sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS kb1,
         sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS kb2
  FROM cblk GROUP BY key),
cnb AS (SELECT eid, count(*) AS nb FROM cblk GROUP BY eid),
cpr AS MATERIALIZED (
  SELECT a.eid AS id1, b.eid AS id2, count(*) AS cbs,
         sum(1.0 / (k.kb1 * k.kb2)) AS inv_card,
         sum(1.0 / (k.kb1 + k.kb2)) AS inv_size
  FROM cblk a JOIN cblk b ON a.key = b.key AND a.side = 1 AND b.side = 2
  JOIN ckst k ON k.key = a.key
  GROUP BY 1, 2)"""

    _CJS = """cjs AS (
  SELECT p.id1, p.id2, p.cbs,
         CAST(p.cbs AS DOUBLE) / (n1.nb + n2.nb - p.cbs) AS w
  FROM cpr p JOIN cnb n1 ON n1.eid = p.id1 JOIN cnb n2 ON n2.eid = p.id2)"""

    o["ccer_wep_ejs"] = f"""WITH {_CED},
{_CJS},
ccmp1 AS (SELECT id1, CAST(count(*) AS DOUBLE) AS c FROM cpr GROUP BY id1),
ccmp2 AS (SELECT id2, CAST(count(*) AS DOUBLE) AS c FROM cpr GROUP BY id2),
cdd AS (SELECT CAST(count(*) AS DOUBLE) AS d FROM cpr),
cwe AS (
  SELECT j.id1, j.id2,
         j.w * log10(cdd.d / c1.c) * log10(cdd.d / c2.c) AS w
  FROM cjs j JOIN ccmp1 c1 ON c1.id1 = j.id1
  JOIN ccmp2 c2 ON c2.id2 = j.id2, cdd)
SELECT id1, id2, round(w, 6) AS weight FROM cwe
WHERE w >= (SELECT avg(w) FROM cwe) - {EPS}"""

    def _chi2_sql(o11: str, o12: str, o21: str, o22: str) -> str:
        tot = f"({o11}+{o12}+{o21}+{o22})"
        def term(o, r, c):
            return (f"(CASE WHEN ({r})*({c}) <> 0 THEN "
                    f"(({o}) - ({r})*({c})/{tot}) * (({o}) - ({r})*({c})/{tot})"
                    f" / (({r})*({c})/{tot}) ELSE 0 END)")
        r1, r2 = f"({o11}+{o12})", f"({o21}+{o22})"
        c1, c2 = f"({o11}+{o21})", f"({o12}+{o22})"
        return (term(o11, r1, c1) + "\n       + " + term(o12, r1, c2)
                + "\n       + " + term(o21, r2, c1)
                + "\n       + " + term(o22, r2, c2))

    _CX2 = f"""cnblk AS (SELECT CAST(count(DISTINCT key) AS DOUBLE) AS n FROM cblk),
ccells AS (
  SELECT p.id1, p.id2,
         CAST(p.cbs AS DOUBLE) AS o11,
         CAST(n1.nb - p.cbs AS DOUBLE) AS o12,
         CAST(n2.nb - p.cbs AS DOUBLE) AS o21,
         cnblk.n - n1.nb + p.cbs AS o22
  FROM cpr p JOIN cnb n1 ON n1.eid = p.id1
  JOIN cnb n2 ON n2.eid = p.id2, cnblk),
cx2 AS (
  SELECT id1, id2,
         {_chi2_sql('o11', 'o12', 'o21', 'o22')} AS w
  FROM ccells)"""

    o["ccer_wep_x2"] = f"""WITH {_CED},
{_CX2}
SELECT id1, id2, round(w, 6) AS weight FROM cx2
WHERE w >= (SELECT avg(w) FROM cx2) - {EPS}"""

    # k = int(max(1, block_assignments / num_entities)) — floor for >= 1
    _CK = """ck AS (
  SELECT greatest(1, CAST(floor(
      (SELECT count(*) FROM cblk) * 1.0
      / (SELECT count(DISTINCT eid) FROM cblk)) AS BIGINT)) AS kv)"""

    def _ccer_cnp_sql(edge_cte: str, edge_name: str, reciprocal: bool) -> str:
        keep = ("r.ru IS NOT NULL AND t.u_side = 1" if reciprocal
                else "r.ru IS NULL OR t.u_side = 1")
        return f"""WITH {_CED},
{edge_cte},
{_CK},
cbidir AS (
  SELECT id1 AS u, id2 AS v, 1 AS u_side, w FROM {edge_name}
  UNION ALL SELECT id2, id1, 2, w FROM {edge_name}),
cnear AS MATERIALIZED (
  SELECT u, v, u_side, w FROM (
    SELECT u, v, u_side, w,
           row_number() OVER (PARTITION BY u ORDER BY w DESC, v DESC) AS rn
    FROM cbidir)
  WHERE rn <= (SELECT kv FROM ck)),
cval AS (
  SELECT t.u, t.v, t.u_side, t.w
  FROM cnear t LEFT JOIN (SELECT u AS ru, v AS rv FROM cnear) r
    ON r.ru = t.v AND r.rv = t.u
  WHERE {keep})
SELECT id1, id2, round(max(w), 6) AS weight FROM (
  SELECT CASE WHEN u_side = 1 THEN u ELSE v END AS id1,
         CASE WHEN u_side = 1 THEN v ELSE u END AS id2, w
  FROM cval)
GROUP BY id1, id2"""

    o["ccer_cnp_js"] = _ccer_cnp_sql(_CJS, "cjs", reciprocal=False)

    _CCN = """ccn AS (
  SELECT id1, id2, inv_card + cbs AS w FROM cpr)"""
    o["ccer_rcnp_cncbs"] = _ccer_cnp_sql(_CCN, "ccn", reciprocal=True)

    # the best-CCER recipe end to end: blocking -> CCER BlockFiltering
    # (0.9, java-round, both-sides validity) -> WEP(EJS) -> char-3gram
    # tfidf cosine -> UMC(0.17) greedy recursion
    o["ccer_best_chain"] = f"""WITH RECURSIVE {_CTOK},
bfc AS (
  SELECT key,
         sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
         * sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS card
  FROM cblk GROUP BY key),
brk AS (
  SELECT b.key, b.eid, b.side,
         row_number() OVER (PARTITION BY b.eid ORDER BY c.card, b.key) AS rn,
         count(*) OVER (PARTITION BY b.eid) AS n
  FROM cblk b JOIN bfc c ON c.key = b.key),
bkept AS (SELECT key, eid, side FROM brk WHERE rn <= floor(0.9 * n + 0.5)),
fblk AS (
  SELECT key, eid, side FROM (
    SELECT key, eid, side,
           sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY key) AS n1,
           sum(CASE WHEN side = 2 THEN 1 ELSE 0 END)
               OVER (PARTITION BY key) AS n2
    FROM bkept)
  WHERE n1 >= 1 AND n2 >= 1),
fnb AS (SELECT eid, count(*) AS nb FROM fblk GROUP BY eid),
fpr AS MATERIALIZED (
  SELECT a.eid AS id1, b.eid AS id2, count(*) AS cbs
  FROM fblk a JOIN fblk b ON a.key = b.key AND a.side = 1 AND b.side = 2
  GROUP BY 1, 2),
fjs AS (
  SELECT p.id1, p.id2,
         CAST(p.cbs AS DOUBLE) / (n1.nb + n2.nb - p.cbs) AS js
  FROM fpr p JOIN fnb n1 ON n1.eid = p.id1 JOIN fnb n2 ON n2.eid = p.id2),
fc1 AS (SELECT id1, CAST(count(*) AS DOUBLE) AS c FROM fpr GROUP BY id1),
fc2 AS (SELECT id2, CAST(count(*) AS DOUBLE) AS c FROM fpr GROUP BY id2),
fdd AS (SELECT CAST(count(*) AS DOUBLE) AS d FROM fpr),
fwe AS (
  SELECT j.id1, j.id2,
         j.js * log10(fdd.d / c1.c) * log10(fdd.d / c2.c) AS w
  FROM fjs j JOIN fc1 c1 ON c1.id1 = j.id1
  JOIN fc2 c2 ON c2.id2 = j.id2, fdd),
fwep AS (
  SELECT id1, id2 FROM fwe
  WHERE w >= (SELECT avg(w) FROM fwe) - {EPS} AND id1 % 8 = 0),
tg3 AS (
  SELECT doc_id AS eid, g AS term FROM (
    SELECT doc_id, unnest(CASE WHEN len(lower(text)) < 3 THEN []
           ELSE list_transform(range(1, len(lower(text)) - 1),
                i -> substr(lower(text), i, 3)) END) AS g
    FROM documents)),
ttf AS (SELECT eid, term, CAST(count(*) AS DOUBLE) AS tf
        FROM tg3 GROUP BY 1, 2),
tnn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
tdf2 AS (SELECT term, count(*) AS df FROM ttf GROUP BY term),
tidf AS (SELECT term, ln((1.0 + tnn.n) / (1.0 + df)) + 1.0 AS idf
         FROM tdf2, tnn),
tw AS MATERIALIZED (
  SELECT t.eid, t.term, t.tf * i.idf AS w
  FROM ttf t JOIN tidf i ON i.term = t.term),
tnorm AS (SELECT eid, sqrt(sum(w * w)) AS nrm FROM tw GROUP BY eid),
tdot AS (
  SELECT p.id1, p.id2, sum(a.w * b.w) AS dot
  FROM fwep p JOIN tw a ON a.eid = p.id1
  JOIN tw b ON b.eid = p.id2 AND b.term = a.term
  GROUP BY 1, 2),
tmt AS MATERIALIZED (
  SELECT p.id1, p.id2,
         round(coalesce(d.dot, 0.0) / (x.nrm * y.nrm), 6) AS sim
  FROM fwep p LEFT JOIN tdot d ON d.id1 = p.id1 AND d.id2 = p.id2
  JOIN tnorm x ON x.eid = p.id1 JOIN tnorm y ON y.eid = p.id2),
bumr AS MATERIALIZED (
  SELECT id1, id2, sim,
         row_number() OVER (ORDER BY (1.0 - sim), id1, id2) AS rn
  FROM tmt WHERE sim > 0.17),
bumg AS (
  SELECT 0 AS rn, CAST([] AS BIGINT[]) AS matched,
         CAST(NULL AS BIGINT) AS m1, CAST(NULL AS BIGINT) AS m2,
         CAST(NULL AS DOUBLE) AS mw
  UNION ALL
  SELECT r.rn,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN g.matched
              ELSE list_append(list_append(g.matched, r.id1), r.id2) END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.id1 END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.id2 END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.sim END
  FROM bumg g JOIN bumr r ON r.rn = g.rn + 1)
SELECT m1 AS id1, m2 AS id2, mw AS weight FROM bumg WHERE m1 IS NOT NULL"""

    o["ccer_cep_js"] = f"""WITH {_CED},
{_CJS}
SELECT id1, id2, round(w, 6) AS weight FROM (
  SELECT id1, id2, w,
         row_number() OVER (ORDER BY w DESC, id2 DESC, id1 DESC) AS rn
  FROM cjs)
WHERE rn <= (SELECT CAST(floor(count(*) / 2) AS BIGINT) FROM cblk)"""

    o["ccer_blast_x2"] = f"""WITH {_CED},
{_CX2},
cbm AS (
  SELECT node, max(w) AS mx FROM (
    SELECT id1 AS node, w FROM cx2 UNION ALL SELECT id2, w FROM cx2)
  GROUP BY node)
SELECT x.id1, x.id2, round(x.w, 6) AS weight
FROM cx2 x JOIN cbm m1 ON m1.node = x.id1 JOIN cbm m2 ON m2.node = x.id2
WHERE x.w >= (m1.mx + m2.mx) / 4 - {EPS}"""

    _CMATCH = f"""{_CWEP},
cm_wt AS (
  SELECT doc_id AS eid,
         list_sort(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))) AS t
  FROM documents),
cmt AS (
  SELECT id1, id2, sim FROM (
    SELECT p.id1, p.id2,
           round(CASE WHEN a.t = b.t THEN 1.0
                 WHEN len(a.t) = 0 OR len(b.t) = 0 THEN 0.0
                 ELSE len(list_intersect(a.t, b.t))
                      / (sqrt(CAST(len(a.t) AS DOUBLE)) * sqrt(CAST(len(b.t) AS DOUBLE)))
                 END, 6) AS sim
    FROM cwep p JOIN cm_wt a ON a.eid = p.id1 JOIN cm_wt b ON b.eid = p.id2)
  WHERE sim > 0.55)"""

    o["ccer_em_cosine"] = f"""WITH {_CMATCH}
SELECT id1, id2, sim FROM cmt"""

    # CCER UniqueMapping: the same sequential greedy as Dirty-ER UMC —
    # recursive CTE over (1-w, id1, id2) PQ order
    o["ccer_unique_mapping"] = f"""WITH RECURSIVE {_CMATCH},
cumr AS MATERIALIZED (
  SELECT id1, id2, sim,
         row_number() OVER (ORDER BY (1.0 - sim), id1, id2) AS rn
  FROM cmt WHERE sim > 0.55 AND id1 % 8 = 0),
cumg AS (
  SELECT 0 AS rn, CAST([] AS BIGINT[]) AS matched,
         CAST(NULL AS BIGINT) AS m1, CAST(NULL AS BIGINT) AS m2,
         CAST(NULL AS DOUBLE) AS mw
  UNION ALL
  SELECT r.rn,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN g.matched
              ELSE list_append(list_append(g.matched, r.id1), r.id2) END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.id1 END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.id2 END,
         CASE WHEN list_contains(g.matched, r.id1)
               OR list_contains(g.matched, r.id2)
              THEN NULL ELSE r.sim END
  FROM cumg g JOIN cumr r ON r.rn = g.rn + 1)
SELECT m1 AS id1, m2 AS id2, mw AS weight FROM cumg WHERE m1 IS NOT NULL"""

    # greedy clusterers: desc-weight sequential scans -> recursive CTEs
    # over the rank order, carrying role/assignment arrays. Shared edge
    # base: cosine matches > 0.55 on the 8x-thinned CNP candidates.
    _GEDGE = f"""{SB},
{_cnp_sql('sb', 'cnp', 'JS')},
gcnp8 AS (SELECT id1, id2 FROM cnp WHERE id1 % 8 = 0),
{_matching_cosine_sql('gcnp8', 0.55, 'gmt')}"""

    # BestMatch: per (id1-source, id2-target) greedy, each side used once
    o["best_match_clustering"] = f"""WITH RECURSIVE {_GEDGE},
bmr AS MATERIALIZED (
  SELECT id1, id2, sim,
         row_number() OVER (ORDER BY sim DESC, id1, id2) AS rn
  FROM gmt),
bmg AS (
  SELECT 0 AS rn, CAST([] AS BIGINT[]) AS ts, CAST([] AS BIGINT[]) AS td,
         CAST(NULL AS BIGINT) AS m1, CAST(NULL AS BIGINT) AS m2,
         CAST(NULL AS DOUBLE) AS mw
  UNION ALL
  SELECT r.rn,
         CASE WHEN list_contains(g.ts, r.id1) OR list_contains(g.td, r.id2)
              THEN g.ts ELSE list_append(g.ts, r.id1) END,
         CASE WHEN list_contains(g.ts, r.id1) OR list_contains(g.td, r.id2)
              THEN g.td ELSE list_append(g.td, r.id2) END,
         CASE WHEN list_contains(g.ts, r.id1) OR list_contains(g.td, r.id2)
              THEN NULL ELSE r.id1 END,
         CASE WHEN list_contains(g.ts, r.id1) OR list_contains(g.td, r.id2)
              THEN NULL ELSE r.id2 END,
         CASE WHEN list_contains(g.ts, r.id1) OR list_contains(g.td, r.id2)
              THEN NULL ELSE r.sim END
  FROM bmg g JOIN bmr r ON r.rn = g.rn + 1)
SELECT m1 AS id1, m2 AS id2, mw AS weight FROM bmg WHERE m1 IS NOT NULL"""

    # Center/MergeCenter: center-member role state machine; the ranked
    # edge weight is sim/sum1 + sim/sum2 (center) or raw sim (merge)
    def _center_sql(weighted_cte: str, wname: str) -> str:
        c1 = f"list_contains(g.cen, r.id1)"
        c2 = f"list_contains(g.cen, r.id2)"
        m1 = f"list_contains(g.mem, r.id1)"
        m2 = f"list_contains(g.mem, r.id2)"
        skip = f"(({c1}) AND ({c2})) OR (({m1}) AND ({m2})) OR (({c1}) AND ({m2})) OR (({c2}) AND ({m1}))"
        none = f"NOT ({c1}) AND NOT ({m1}) AND NOT ({c2}) AND NOT ({m2})"
        r1 = f"NOT ({skip}) AND NOT ({none}) AND ({c1}) AND NOT ({c2}) AND NOT ({m2})"
        r2 = f"NOT ({skip}) AND NOT ({none}) AND ({c2}) AND NOT ({c1}) AND NOT ({m1})"
        none = f"NOT ({skip}) AND {none}"
        return f"""WITH RECURSIVE {_GEDGE},
{weighted_cte},
ctr AS MATERIALIZED (
  SELECT id1, id2,
         row_number() OVER (ORDER BY {wname} DESC, id1, id2) AS rn
  FROM cwt),
ctg AS (
  SELECT 0 AS rn, CAST([] AS BIGINT[]) AS cen, CAST([] AS BIGINT[]) AS mem,
         CAST([] AS BIGINT[]) AS me, CAST([] AS BIGINT[]) AS mc
  UNION ALL
  SELECT r.rn,
         CASE WHEN {none} THEN list_append(g.cen, r.id1) ELSE g.cen END,
         CASE WHEN {none} THEN list_append(g.mem, r.id2)
              WHEN {r1} THEN list_append(g.mem, r.id2)
              WHEN {r2} THEN list_append(g.mem, r.id1) ELSE g.mem END,
         CASE WHEN {none} THEN list_append(g.me, r.id2)
              WHEN {r1} THEN list_append(g.me, r.id2)
              WHEN {r2} THEN list_append(g.me, r.id1) ELSE g.me END,
         CASE WHEN {none} THEN list_append(g.mc, r.id1)
              WHEN {r1} THEN list_append(g.mc, r.id1)
              WHEN {r2} THEN list_append(g.mc, r.id2) ELSE g.mc END
  FROM ctg g JOIN ctr r ON r.rn = g.rn + 1),
ctl AS (
  SELECT cen, me, mc FROM (
    SELECT cen, me, mc, row_number() OVER (ORDER BY rn DESC) AS rr FROM ctg)
  WHERE rr = 1)
SELECT eid, cluster_id FROM (
  SELECT unnest(cen) AS eid, unnest(cen) AS cluster_id FROM ctl
  UNION ALL
  SELECT unnest(me), unnest(mc) FROM ctl)"""

    _CENTER_W = """csum AS (
  SELECT u, sum(w) AS s FROM (
    SELECT id1 AS u, sim AS w FROM gmt
    UNION ALL SELECT id2, sim FROM gmt)
  GROUP BY u),
cwt AS (
  SELECT m.id1, m.id2, m.sim / s1.s + m.sim / s2.s AS cw
  FROM gmt m JOIN csum s1 ON s1.u = m.id1 JOIN csum s2 ON s2.u = m.id2)"""
    o["center_clustering"] = _center_sql(_CENTER_W, "cw")

    _MERGE_W = """cwt AS (SELECT id1, id2, sim FROM gmt)"""
    o["merge_center_clustering"] = _center_sql(_MERGE_W, "sim")

    o["ccer_ccc"] = f"""WITH RECURSIVE {_CMATCH},
cbidir AS (
  SELECT id1 AS u, id2 AS v FROM cmt UNION SELECT id2, id1 FROM cmt),
creach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM cbidir)
  UNION
  SELECT r.u, b.v FROM creach r JOIN cbidir b ON r.v = b.u),
cassign AS (SELECT u AS doc_id, min(v) AS cluster_id FROM creach GROUP BY u),
csizes AS (SELECT cluster_id, count(*) AS n FROM cassign GROUP BY cluster_id)
SELECT a.doc_id, a.cluster_id
FROM cassign a JOIN csizes s ON s.cluster_id = a.cluster_id AND s.n = 2"""

    return o


ORACLES = _build_oracles()


# Registry order = the order the round driver checks queries in, and the
# driver's budget may not reach the tail. Front-load (a) queries whose
# implementation or oracle changed this round and (b) queries the r01
# driver never saw, so every query accumulates a driver CORRECTNESS row
# across rounds; long-green unchanged queries move to the tail.
_DRIVER_PRIORITY = [
    # behavior-touched in round 6 — every end-to-end consumer of the
    # new Arrow verify kernel (jaccard_verify impl swap) plus the
    # rdf_subject_er two-pass lid rank; streaming_reconciled exercises
    # the kernel inside foreachBatch, the riskiest execution context.
    # simhash_signatures joined late-round when its impl swapped to
    # the Arrow SimHash kernel (simhash_pairs, its end-to-end
    # consumer, is already below); video_frame_sample (rows-only, no
    # oracle to compare) ceded the slot to keep the list at 50.
    "rdf_subject_er", "corpus_clean_tiered", "streaming_reconciled",
    "webtext_minhash_clusters", "tiered_near_dup", "corpus_clean",
    "simhash_signatures",
    # rotation round 3 of 3 (r5 verdict item 3): of the 43 queries
    # whose freshest driver row is r03 (computed from
    # CORRECTNESS_r01-r05.json — every other registry query has an
    # r04/r05 row), the 38 that fit after the kernel consumers above;
    # the 5 left at r3 (clean_text, events_windowed, pii_counts,
    # tf_cosine, boolean_cosine) are pure column-expression queries no
    # r4-r6 change touches, and the full local oracle gate re-greens
    # them each round. minhash_near_dup and the lsh-pair queries also
    # sit on the r6 verify-kernel diff.
    "ann_lsh_topk", "ann_topk", "ann_topk_from_text",
    "best_match_clustering", "ccer_ccc",
    "ccer_em_cosine", "ccer_pairs_cp", "ccer_wep_js",
    "center_clustering", "correlation_clustering",
    "cut_clustering", "duplicate_spans", "ejoin_dice_multiset",
    "ejoin_jaccard_qgrams", "em_jaro", "em_levenshtein",
    "embedding_dedup", "embeddings_nn_bpm",
    "kiraly_clustering", "line_dedup", "lsh_recall_eval",
    "merge_center_clustering", "minhash_lsh_pairs",
    "minhash_lsh_pairs_salted", "minhash_near_dup",
    "ricochet_clustering", "schema_jaccard_leven",
    "schema_name_matches", "simhash_pairs", "source_quota",
    "spatial_equigrid_cf", "spatial_equigrid_js", "spatial_topk_mbr",
    "substring_dedup", "tfidf_cosine", "topk_join_pm",
    "url_dedup",
    # flagship + headline guards (keep a fresh row every round)
    "der_dedup_clusters", "meta_cnp_cleaned", "minhash_bands",
    "ejoin_cosine", "ann_ivf_topk", "ccer_best_chain",
]

QUERIES = {
    **{k: QUERIES[k] for k in _DRIVER_PRIORITY if k in QUERIES},
    **{k: v for k, v in QUERIES.items() if k not in _DRIVER_PRIORITY},
}
