"""Top-k collection + cross-partition merge, TopScoreDocCollector-faithful.

Semantics re-created from solr-8.4.0/lucene/core/.../search/
TopScoreDocCollector.java:51-102 and IndexSearcher.java:105,440:
- k-size min-heap ordered by (score asc, docID desc): the worst entry is the
  lowest score, ties broken so the LARGER docID is worse (docs collected in
  ascending-doc order; an equal-score later doc never displaces).
- min competitive score = nextUp(heap-min score) once the heap is full and
  the total-hits threshold (default 1000) is reached.
- multi-partition reduce = merge of per-partition top-k lists by
  (score desc, global docID asc) — CollectorManager.reduce equivalent.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

DEFAULT_TOTAL_HITS_THRESHOLD = 1000  # IndexSearcher.TOTAL_HITS_THRESHOLD


@dataclass
class TopDocs:
    doc_ids: np.ndarray  # global docIDs, best-first
    scores: np.ndarray  # float32, descending (ties: ascending doc)
    total_hits: int = 0
    total_hits_is_lower_bound: bool = False

    def to_lists(self):
        return [int(d) for d in self.doc_ids], [float(s) for s in self.scores]


class TopKCollector:
    """Streaming (score, doc) collector with nextUp min-competitive feedback."""

    def __init__(self, k: int, total_hits_threshold: int = DEFAULT_TOTAL_HITS_THRESHOLD):
        self.k = k
        self.threshold = total_hits_threshold
        self.heap: list[tuple[float, int]] = []  # (score, -doc): root == worst
        self.total_hits = 0
        # set by pruning scorers that skipped uncounted matches: the count
        # is then GREATER_THAN_OR_EQUAL regardless of the threshold
        self.force_lower_bound = False

    def collect(self, doc: int, score: float) -> None:
        self.total_hits += 1
        entry = (score, -doc)
        if len(self.heap) < self.k:
            heapq.heappush(self.heap, entry)
        elif entry > self.heap[0]:
            heapq.heapreplace(self.heap, entry)

    def collect_batch(self, docs: np.ndarray, scores: np.ndarray) -> None:
        """Vectorized collect: count every hit, heap-push only entries that
        can compete (score >= current heap-min) — same resulting heap as
        per-doc collect() in any order, since heap CONTENT depends only on
        the (score, -doc) multiset."""
        n = len(docs)
        self.total_hits += n
        if n == 0:
            return
        if len(self.heap) >= self.k:
            floor = self.heap[0][0]
            m = scores >= floor  # candidates; exact tie-break re-checked below
            docs, scores = docs[m], scores[m]
        for d, s in zip(docs, scores):
            entry = (float(s), -int(d))
            if len(self.heap) < self.k:
                heapq.heappush(self.heap, entry)
            elif entry > self.heap[0]:
                heapq.heapreplace(self.heap, entry)

    def min_competitive(self) -> float:
        """nextUp(heap min) once full + threshold reached, else 0."""
        if len(self.heap) >= self.k and self.total_hits >= self.threshold:
            return float(np.nextafter(np.float32(self.heap[0][0]), np.float32(np.inf)))
        return 0.0

    def is_full(self) -> bool:
        return len(self.heap) >= self.k

    def result(self) -> TopDocs:
        ordered = sorted(self.heap, key=lambda e: (-e[0], -e[1]))
        return TopDocs(
            doc_ids=np.array([-d for _, d in ordered], dtype=np.int64),
            scores=np.array([s for s, _ in ordered], dtype=np.float32),
            total_hits=self.total_hits,
            total_hits_is_lower_bound=(
                self.force_lower_bound or self.total_hits >= self.threshold
            ),
        )


def topk_from_arrays(docs: np.ndarray, scores: np.ndarray, k: int) -> TopDocs:
    """Exhaustive top-k: best k by (score desc, doc asc) from full arrays."""
    n = len(docs)
    if n == 0:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    if n > k:
        # pre-select with argpartition, then exact sort of the slice
        part = np.argpartition(-scores.astype(np.float64), k - 1)[:k]
        # include equal-score boundary docs for exact doc tie-break: re-sort
        # over a slightly larger candidate set is avoided by sorting all
        # entries with score >= kth score
        kth = scores[part].min()
        cand = np.nonzero(scores >= kth)[0]
    else:
        cand = np.arange(n)
    order = np.lexsort((docs[cand], -scores[cand].astype(np.float64)))[:k]
    sel = cand[order]
    return TopDocs(docs[sel].astype(np.int64), scores[sel].astype(np.float32), total_hits=n)


def merge_topk(parts: list[TopDocs], k: int) -> TopDocs:
    """CollectorManager.reduce: merge per-partition top-k by (score, doc)."""
    if not parts:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    docs = np.concatenate([p.doc_ids for p in parts])
    scores = np.concatenate([p.scores for p in parts])
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return TopDocs(
        doc_ids=docs[order],
        scores=scores[order],
        total_hits=sum(p.total_hits for p in parts),
        total_hits_is_lower_bound=any(p.total_hits_is_lower_bound for p in parts),
    )


def diversified_top_k(
    docs: np.ndarray,
    keys: np.ndarray,
    scores: np.ndarray,
    k: int,
    max_per_key: int,
) -> np.ndarray:
    """DiversifiedTopDocsCollector (s84 misc/.../search/
    DiversifiedTopDocsCollector.java:48): global top-k by (score desc,
    docID asc) with at most ``max_per_key`` hits sharing one key.

    Greedy acceptance in global score order is equivalent to "keep each
    key's top max_per_key, then the global top-k": when the doc with
    key-rank r is reached, exactly r-1 same-key predecessors have been
    accepted, so docs with key-rank <= max_per_key are always accepted
    and the rest never are. Returns the selected indices into the input
    arrays, in final rank order."""
    if len(docs) == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((docs, -np.asarray(scores, dtype=np.float64)))
    kk = np.asarray(keys)[order]
    _, inv = np.unique(kk, return_inverse=True)
    # occurrence number of each key along the score-ordered stream,
    # vectorized: stable-sort by key preserves score order inside a key,
    # so position-minus-group-start is the within-key rank
    sidx = np.argsort(inv, kind="stable")
    grp = inv[sidx]
    starts = np.searchsorted(grp, np.arange(grp[-1] + 1 if len(grp) else 0))
    krank = np.empty(len(kk), dtype=np.int64)
    krank[sidx] = np.arange(len(kk)) - starts[grp]
    return order[krank < max_per_key][:k]
