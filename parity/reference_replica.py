"""Faithful pure-Python replica of the reference's best Dirty-ER chain
(pyJedAI cannot be imported here — sklearn/nltk/faiss are absent — so
this module re-implements, from the spec, EXACTLY the semantics of:

  StandardBlocking        block_building.py:485-525 (tokenize 503-512)
  BlockPurging            block_cleaning.py:110-207 (threshold 158-198)
  BlockFiltering          block_cleaning.py:33-108  (core 82-97)
  CardinalityNodePruning  comparison_cleaning.py:475-546 (PQ top-k)
  EntityMatching(cosine)  matching.py:493-537 + string_matchers.py:39-54
  ConnectedComponents     clustering.py:431-475 (networkx)

using only stdlib + networkx. It is the recall oracle for the
dup-pair-recall >= 0.99 acceptance criterion (BASELINE.json).

One deliberate determinism fix (documented in SURVEY §4 item 4): the
reference's block order comes from python set/dict iteration order,
which is PYTHONHASHSEED-dependent — the reference itself is not
run-to-run reproducible. Here ties sort by (cardinality, key), the same
total order the Spark engine uses, so both sides are deterministic and
comparable.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from queue import PriorityQueue

import networkx as nx


def tokenize(s: str) -> list[str]:
    return sorted(set(filter(None, re.split(r"[\W_]", s.lower()))))


def standard_blocking(texts: dict[int, str]) -> dict[str, set[int]]:
    blocks: dict[str, set[int]] = defaultdict(set)
    for eid in sorted(texts):
        for tok in tokenize(texts[eid]):
            blocks[tok].add(eid)
    return {k: v for k, v in blocks.items() if len(v) >= 2}


def _card(block: set[int]) -> float:
    n = len(block)
    return n * (n - 1) / 2


def block_purging(blocks: dict[str, set[int]],
                  smoothing_factor: float = 1.0) -> dict[str, set[int]]:
    ordered = sorted(blocks.items(), key=lambda kv: (_card(kv[1]), kv[0]))
    levels: list[list[float]] = []
    for _, b in ordered:
        c = _card(b)
        if not levels or levels[-1][0] != c:
            prev_bs = levels[-1][1] if levels else 0.0
            prev_cc = levels[-1][2] if levels else 0.0
            levels.append([c, prev_bs, prev_cc])
        levels[-1][1] += len(b)
        levels[-1][2] += c
    cur_bc = cur_cc = cur_size = prev_bc = prev_cc = prev_size = 0.0
    for i in range(len(levels) - 1, 0, -1):
        prev_size, prev_bc, prev_cc = cur_size, cur_bc, cur_cc
        cur_size, cur_bc, cur_cc = levels[i]
        if cur_bc * prev_cc < smoothing_factor * cur_cc * prev_bc:
            break
    thr = prev_size
    return {k: v for k, v in blocks.items() if _card(v) <= thr}


def java_round(x: float) -> int:
    return int(math.floor(x + 0.5))


def block_filtering(blocks: dict[str, set[int]], ratio: float = 0.8
                    ) -> dict[str, set[int]]:
    entity_index: dict[int, list[str]] = defaultdict(list)
    for key, b in sorted(blocks.items(), key=lambda kv: (_card(kv[1]), kv[0])):
        for eid in b:
            entity_index[eid].append(key)
    filtered: dict[str, set[int]] = defaultdict(set)
    for eid, keys in entity_index.items():
        for key in keys[: java_round(ratio * float(len(keys)))]:
            filtered[key].add(eid)
    return {k: v for k, v in filtered.items() if len(v) >= 2}


def cnp_js(blocks: dict[str, set[int]], num_entities: int
           ) -> dict[int, set[int]]:
    """CardinalityNodePruning with JS weights (comparison_cleaning.py:
    475-546; JS at 233-235; node-centric neighbors 259-263; validity
    511-516)."""
    entity_index: dict[int, list[str]] = defaultdict(list)
    for key in blocks:
        for eid in blocks[key]:
            entity_index[eid].append(key)
    ba = sum(len(b) for b in blocks.values())
    threshold = max(1.0, ba / num_entities)
    nearest: dict[int, set[int]] = {}
    for eid in range(num_entities):
        if eid not in entity_index:
            continue
        counters: dict[int, int] = defaultdict(int)
        for key in entity_index[eid]:
            for nb in blocks[key]:
                if nb != eid:
                    counters[nb] += 1
        pq: PriorityQueue = PriorityQueue()
        minimum_weight = -1.0
        for nb in sorted(counters):
            cbs = counters[nb]
            w = cbs / (len(entity_index[eid]) + len(entity_index[nb]) - cbs)
            if w >= minimum_weight:
                pq.put((w, eid, nb))
                if threshold < pq.qsize():
                    minimum_weight = pq.get()[0]
        nearest.setdefault(eid, set())
        while not pq.empty():
            nearest[eid].add(pq.get()[2])
    retained: dict[int, set[int]] = {}
    for i in sorted(nearest):
        for j in nearest[i]:
            valid = True
            if j in nearest and i in nearest[j]:
                valid = i < j
            if valid:
                retained.setdefault(i, set()).add(j)
    return retained


def cosine_sim(s1: str, s2: str) -> float:
    t1 = set(filter(None, re.split(r"\s+", s1.lower())))
    t2 = set(filter(None, re.split(r"\s+", s2.lower())))
    if t1 == t2:
        return 1.0
    if not t1 or not t2:
        return 0.0
    inter = len(t1 & t2)
    return inter / (math.sqrt(len(t1)) * math.sqrt(len(t2)))


def der_dedup(texts: dict[int, str], purging_smoothing: float = 1.0,
              filtering_ratio: float = 0.8,
              matching_threshold: float = 0.55) -> dict[int, int]:
    """Full chain -> {eid: cluster_id(min member)}."""
    blocks = standard_blocking(texts)
    blocks = block_purging(blocks, purging_smoothing)
    blocks = block_filtering(blocks, filtering_ratio)
    candidates = cnp_js(blocks, num_entities=max(texts) + 1)
    g = nx.Graph()
    for i, nbrs in candidates.items():
        for j in nbrs:
            sim = cosine_sim(texts[i], texts[j])
            if sim > matching_threshold:
                g.add_edge(i, j, weight=sim)
    out = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for eid in comp:
            out[eid] = root
    for eid in texts:
        out.setdefault(eid, eid)
    return out


def dup_pairs_from_clusters(assign: dict[int, int]) -> set[tuple[int, int]]:
    byc: dict[int, list[int]] = defaultdict(list)
    for e, c in assign.items():
        byc[c].append(e)
    pairs = set()
    for members in byc.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs
