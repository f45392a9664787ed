"""Deterministic synthetic Common-Crawl-style webtext with planted
near-duplicate clusters (FIXTURES.md §1; no external data, fixed seed).

Schema: (url string, warc_ts timestamp, html binary, text string,
lang string) + ground-truth duplicate pair table (url1, url2) /
(id1, id2). Cluster membership IS the ground truth; variants are
token-level edits at a configurable mutation rate so MinHash/blocking
recall targets are meaningful.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np

VOCAB = [
    # deterministic mixed-frequency vocabulary (Zipf-ish via repetition)
    "data", "web", "page", "crawl", "index", "search", "link", "site", "text",
    "train", "model", "token", "dedup", "spark", "query", "table", "join",
    "hash", "shard", "batch", "corpus", "filter", "clean", "store", "cache",
    "graph", "node", "edge", "block", "match", "score", "rank", "merge",
    "split", "count", "group", "window", "stream", "stage", "task", "plan",
    "scan", "read", "write", "row", "column", "value", "key", "set", "list",
    "archive", "domain", "content", "server", "client", "header", "footer",
]

LANGS = ["en", "en", "en", "de", "es", "fr", "zh"]  # en-heavy mix


def extended_vocab(size: int) -> list[str]:
    """Deterministic vocabulary of ``size`` tokens: the base words plus
    a generated tail (w00056, w00057, ...). With Zipf(1.3) sampling the
    tail is the realistic long tail real webtext has (typos, ids,
    urls) — the regime where a prefix-filtered similarity join must
    shine, vs the 56-word base vocab where every pair shares tokens."""
    if size <= len(VOCAB):
        return VOCAB[:size]
    return VOCAB + [f"w{i:05d}" for i in range(len(VOCAB), size)]


def generate_webtext(n_docs: int = 500, dup_fraction: float = 0.3,
                     cluster_size_max: int = 4, mutation_rate: float = 0.1,
                     doc_len: tuple[int, int] = (30, 120),
                     seed: int = 42, vocab_size: int | None = None):
    """Returns (rows, gt_pairs): rows are dicts matching the webtext
    schema plus eid; gt_pairs are (eid1, eid2) true duplicate pairs
    (all intra-cluster pairs).

    Deterministic: numpy RandomState(seed) only. ``vocab_size`` extends
    the vocabulary (default: the 56 base words, unchanged for test
    stability); the bench's Zipfian corpus uses 20k.
    """
    rng = np.random.RandomState(seed)
    vocab = extended_vocab(vocab_size) if vocab_size else VOCAB
    base_ts = datetime(2024, 1, 1)
    rows, gt = [], []
    eid = 0
    n_base = int(n_docs / (1 + dup_fraction * (cluster_size_max / 2)))

    def make_doc():
        ln = rng.randint(doc_len[0], doc_len[1])
        # zipf-flavored sampling: low ranks more likely
        idx = rng.zipf(1.3, size=ln * 3) - 1
        idx = idx[idx < len(vocab)][:ln]
        while len(idx) < ln:
            extra = rng.zipf(1.3, size=ln) - 1
            idx = np.concatenate([idx, extra[extra < len(vocab)]])[:ln]
        return [vocab[i] for i in idx]

    def mutate(tokens):
        toks = list(tokens)
        n_mut = max(1, int(len(toks) * mutation_rate))
        for _ in range(n_mut):
            op = rng.randint(3)
            pos = rng.randint(len(toks))
            if op == 0:  # replace
                toks[pos] = vocab[rng.randint(len(vocab))]
            elif op == 1 and len(toks) > 5:  # delete
                toks.pop(pos)
            else:  # insert
                toks.insert(pos, vocab[rng.randint(len(vocab))])
        return toks

    def emit(tokens, cluster_root):
        nonlocal eid
        text = " ".join(tokens)
        url = f"https://example.org/p/{eid:08d}"
        # tag-only chrome (no extra text content) so that
        # extract_text_py(html) == text byte-for-byte — the per-url
        # invariant of BASELINE.json input_hint
        html = (f'<html><head><meta charset="utf-8" data-doc="{eid}"/></head>'
                f"<body><p>{text}</p></body></html>").encode("utf-8")
        rows.append({
            "eid": eid,
            "url": url,
            "warc_ts": base_ts + timedelta(seconds=int(rng.randint(0, 10_000_000))),
            "html": html,
            "text": text,
            "lang": LANGS[rng.randint(len(LANGS))],
        })
        eid += 1
        return eid - 1

    while eid < n_docs:
        toks = make_doc()
        root = emit(toks, None)
        if rng.rand() < dup_fraction and eid < n_docs:
            csize = rng.randint(1, cluster_size_max)  # extra members
            members = [root]
            for _ in range(csize):
                if eid >= n_docs:
                    break
                members.append(emit(mutate(toks), root))
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    gt.append((members[i], members[j]))
    return rows, gt


def webtext_df(spark, n_docs: int = 500, seed: int = 42, **kw):
    """(docs_df, gt_df) Spark DataFrames of the synthetic corpus."""
    rows, gt = generate_webtext(n_docs=n_docs, seed=seed, **kw)
    docs = spark.createDataFrame(
        [(r["eid"], r["url"], r["warc_ts"], bytearray(r["html"]), r["text"],
          r["lang"]) for r in rows],
        "eid long, url string, warc_ts timestamp, html binary, text string, lang string",
    )
    gt_df = spark.createDataFrame(gt or [(None, None)],
                                  "id1 long, id2 long")
    if not gt:
        gt_df = gt_df.where("id1 is not null")
    return docs, gt_df
