"""Block-max WAND top-k over the packed postings (SURVEY.md §2.4 v1 core).

Algorithm re-created from the reference's semantics (not a port):
- WANDScorer.java:45-326: prune docs whose Σ max_score < minCompetitiveScore,
  with float scores scaled into integers — max scores rounded UP, the min
  competitive score rounded DOWN (functions/wand_math.py) so pruning can
  never drop a true top-k hit.
- ImpactsDISI.java:79-130 + MaxScoreCache.java:62-106: per-128-doc-block max
  scores derived from the stored competitive (freq, norm) impact pairs drive
  block-level skipping (advanceShallow equivalent).
- Skipping uses the flat per-block last_doc array (searchsorted) instead of
  the multi-level skip list — same O(log) advance contract
  (Lucene84SkipWriter replacement, SURVEY.md §2.7).

This is the document-at-a-time scale path: it decodes only the blocks it
visits. The exhaustive scorer (scorers.py) is the duel oracle; the pytest
duels assert rank-identical (docID, score) sequences between the two.
"""

from __future__ import annotations

import numpy as np

from ..functions.bm25 import BM25, BM25TermWeight
from ..functions.wand_math import scale_max_score, scale_min_score, scaling_factor
from ..state.segment import SegmentReader, TermPostings
from .scorers import CollectionStats
from .topk import DEFAULT_TOTAL_HITS_THRESHOLD, TopDocs, TopKCollector

NO_MORE_DOCS = np.iinfo(np.int64).max


class TermIterator:
    """Postings cursor with block-max metadata (TermScorer + ImpactsDISI)."""

    __slots__ = (
        "tp", "tw", "norms", "nblocks", "block", "docs", "freqs", "pos",
        "max_scaled", "block_max_scaled", "doc",
    )

    def __init__(self, tp: TermPostings, tw: BM25TermWeight, norms: np.ndarray, sf: int):
        self.tp = tp
        self.tw = tw
        self.norms = norms
        self.nblocks = len(tp.doc_widths)
        # per-block scaled (rounded-up) max scores from the impact frontiers
        bms = np.empty(self.nblocks, dtype=np.int64)
        for bi, (f, n) in enumerate(tp.impact_slices()):
            bms[bi] = scale_max_score(tw.max_score(f, n), sf)
        self.block_max_scaled = bms
        self.max_scaled = int(bms.max()) if self.nblocks else 0
        self.block = -1
        self.docs = self.freqs = None
        self.pos = 0
        self.doc = -1
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        if bi >= self.nblocks:
            self.doc = NO_MORE_DOCS
            return
        self.block = bi
        self.docs, self.freqs = self.tp.decode_block(bi)
        self.pos = 0
        self.doc = int(self.docs[0])

    def next_doc(self) -> int:
        self.pos += 1
        if self.pos < len(self.docs):
            self.doc = int(self.docs[self.pos])
        else:
            self._load_block(self.block + 1)
        return self.doc

    def advance(self, target: int) -> int:
        """First doc >= target; block skip via last_docs searchsorted."""
        if self.doc >= target:
            return self.doc
        last = self.tp.last_docs
        if target > int(last[self.block]):
            bi = int(np.searchsorted(last, target))
            if bi >= self.nblocks:
                self.doc = NO_MORE_DOCS
                return self.doc
            self._load_block(bi)
        self.pos = int(np.searchsorted(self.docs, target, side="left"))
        if self.pos >= len(self.docs):  # can't happen if block chosen right
            self._load_block(self.block + 1)
        else:
            self.doc = int(self.docs[self.pos])
        return self.doc

    def block_max_at(self, target: int) -> tuple[int, int]:
        """(scaled block max score, block last doc) for the block holding
        target — the advanceShallow/getMaxScore pair."""
        bi = int(np.searchsorted(self.tp.last_docs, target))
        if bi >= self.nblocks:
            return 0, NO_MORE_DOCS
        return int(self.block_max_scaled[bi]), int(self.tp.last_docs[bi])

    def score(self) -> float:
        freq = int(self.freqs[self.pos])
        return self.tw.score_scalar(freq, int(self.norms[self.doc]))


class ChainedTermIterator:
    """TermIterator over FragmentedPostings: fragments hold disjoint,
    ascending doc ranges (salted hot terms), so chaining their iterators
    in order preserves every TermIterator invariant."""

    __slots__ = ("its", "ci", "max_scaled")

    def __init__(self, parts, tw, norms, sf):
        self.its = [TermIterator(p, tw, norms, sf) for p in parts]
        self.ci = 0
        self.max_scaled = max(it.max_scaled for it in self.its)

    @property
    def doc(self) -> int:
        return self.its[self.ci].doc if self.ci < len(self.its) else NO_MORE_DOCS

    def next_doc(self) -> int:
        if self.ci >= len(self.its):
            return NO_MORE_DOCS
        if self.its[self.ci].next_doc() != NO_MORE_DOCS:
            return self.doc
        # crossing a fragment boundary: the next fragment's iterator is
        # already positioned on its FIRST doc — return it, don't skip it
        self.ci += 1
        while self.ci < len(self.its):
            if self.its[self.ci].doc != NO_MORE_DOCS:
                return self.doc
            self.ci += 1
        return NO_MORE_DOCS

    def advance(self, target: int) -> int:
        while self.ci < len(self.its):
            if self.its[self.ci].advance(target) != NO_MORE_DOCS:
                return self.doc
            self.ci += 1
        return NO_MORE_DOCS

    def block_max_at(self, target: int) -> tuple[int, int]:
        if self.ci >= len(self.its):
            return 0, NO_MORE_DOCS
        return self.its[self.ci].block_max_at(target)

    def score(self) -> float:
        return self.its[self.ci].score()


def _make_iter(tp, tw, norms, sf):
    parts = getattr(tp, "parts", None)
    if parts:
        return ChainedTermIterator(parts, tw, norms, sf)
    return TermIterator(tp, tw, norms, sf)


def conjunction_topk(
    reader,
    term_boosts: list[tuple[str, float]],
    k: int,
    stats: CollectionStats,
    bm25: BM25,
    total_hits_threshold: int = DEFAULT_TOTAL_HITS_THRESHOLD,
    collector: TopKCollector | None = None,
    doc_base: int = 0,
) -> TopDocs:
    """Top-k of a MUST conjunction of term queries with block-max pruning
    (BlockMaxConjunctionScorer.java:30 semantics): leapfrog intersection,
    and once the heap is competitive, windows whose Σ per-clause block max
    stays below the min competitive score are skipped wholesale."""
    iters = []
    pre = []
    max_float = 0.0
    for term, boost in term_boosts:
        tp = reader.term_postings(term)
        if tp is None:
            return (collector or TopKCollector(k, total_hits_threshold)).result()
        tw = bm25.term_weight(stats.df(term), stats.doc_count, stats.sum_total_term_freq, boost)
        pre.append((tp, tw))
        parts = getattr(tp, "parts", None) or [tp]
        m = max(
            (tw.max_score(f, n) for p in parts for f, n in p.impact_slices()),
            default=0.0,
        )
        max_float = max(max_float, m)
    sf = scaling_factor(np.float32(max_float))
    # lead = rarest clause (ConjunctionDISI cost ordering)
    pre.sort(key=lambda p: p[0].doc_freq)
    for tp, tw in pre:
        iters.append(_make_iter(tp, tw, reader.norms, sf))
    coll = collector if collector is not None else TopKCollector(k, total_hits_threshold)

    doc = iters[0].doc
    while doc != NO_MORE_DOCS:
        # leapfrog all clauses to a common doc
        target = doc
        for it in iters:
            d = it.advance(target)
            if d == NO_MORE_DOCS:
                return coll.result()
            target = max(target, d)
        if target != doc:
            doc = target
            continue
        min_scaled = scale_min_score(np.float32(coll.min_competitive()), sf)
        if min_scaled > 0:
            # block-max bound for the window containing doc
            bsum = 0
            window_end = NO_MORE_DOCS
            for it in iters:
                bm, bend = it.block_max_at(doc)
                bsum += bm
                window_end = min(window_end, bend)
            if bsum < min_scaled:
                doc = iters[0].advance(window_end + 1)
                continue
        ssum = 0.0
        for it in iters:
            ssum += it.score()
        coll.collect(doc + doc_base, float(np.float32(ssum)))
        doc = iters[0].next_doc()
    return coll.result()


def wand_topk(
    reader: SegmentReader,
    term_boosts: list[tuple[str, float]],
    k: int,
    stats: CollectionStats,
    bm25: BM25,
    total_hits_threshold: int = DEFAULT_TOTAL_HITS_THRESHOLD,
    collector: TopKCollector | None = None,
    doc_base: int = 0,
) -> TopDocs:
    """Top-k of a SHOULD disjunction of term queries over one segment.

    Pass a shared ``collector`` (and this segment's ``doc_base``) to carry
    the min-competitive score across segments processed in doc_base order —
    the MaxScoreAccumulator cross-slice exchange analogue; collected docIDs
    are then global.
    """
    iters: list[TermIterator] = []
    # one shared scaling factor from the largest clause max score
    pre: list[tuple[TermPostings, BM25TermWeight]] = []
    max_float = 0.0
    for term, boost in term_boosts:
        tp = reader.term_postings(term)
        if tp is None:
            continue
        tw = bm25.term_weight(stats.df(term), stats.doc_count, stats.sum_total_term_freq, boost)
        # a salted hot term on a merged index arrives as FragmentedPostings;
        # its doc-range fragments become independent clauses with the SAME
        # weight — ranges are disjoint, so per-doc scores are unchanged and
        # the Σ-max pruning bound stays valid (merely looser)
        parts = getattr(tp, "parts", None) or [tp]
        for part in parts:
            pre.append((part, tw))
            m = max(
                (tw.max_score(f, n) for f, n in part.impact_slices()),
                default=0.0,
            )
            max_float = max(max_float, m)
    sf = scaling_factor(np.float32(max_float))
    for tp, tw in pre:
        iters.append(TermIterator(tp, tw, reader.norms, sf))

    coll = collector if collector is not None else TopKCollector(k, total_hits_threshold)

    live = [it for it in iters if it.doc != NO_MORE_DOCS]
    while live:
        live.sort(key=lambda it: it.doc)
        min_scaled = scale_min_score(np.float32(coll.min_competitive()), sf)

        # pivot: smallest prefix whose Σ global max >= min competitive
        acc = 0
        pivot_idx = -1
        for i, it in enumerate(live):
            acc += it.max_scaled
            if acc >= min_scaled and acc > 0:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # nothing can compete any more
        pivot_doc = live[pivot_idx].doc

        if live[0].doc == pivot_doc:
            # block-max check (BMW): can any doc in the lead block window
            # compete? Upper bound = Σ block max of the lead clauses (those
            # at pivot_doc) + Σ GLOBAL max of every other clause positioned
            # inside the window (global >= its block max, so the bound is
            # safe); if it is below the min competitive score, nothing in
            # [pivot_doc, window_end] can make the heap — skip the window.
            if min_scaled > 0:
                bsum = 0
                window_end = NO_MORE_DOCS
                for it in live:
                    if it.doc > pivot_doc:
                        break
                    bm, bend = it.block_max_at(pivot_doc)
                    bsum += bm
                    window_end = min(window_end, bend)
                for it in live:
                    if pivot_doc < it.doc <= window_end:
                        bsum += it.max_scaled
                if bsum < min_scaled:
                    target = window_end + 1
                    for it in live:
                        if it.doc <= window_end:
                            it.advance(target)
                    live = [it for it in live if it.doc != NO_MORE_DOCS]
                    continue
            # score pivot_doc: sum clause scores in float64, cast to float32
            ssum = 0.0
            for it in live:
                if it.doc == pivot_doc:
                    ssum += it.score()
                elif it.doc > pivot_doc:
                    break
            score = float(np.float32(ssum))
            coll.collect(pivot_doc + doc_base, score)
            for it in live:
                if it.doc == pivot_doc:
                    it.next_doc()
            live = [it for it in live if it.doc != NO_MORE_DOCS]
        else:
            # advance the highest-max-score clause strictly BEFORE the pivot
            # doc up to it (ties at pivot_doc must not be picked: advancing
            # them is a no-op and would spin the loop)
            behind = [it for it in live if it.doc < pivot_doc]
            adv = max(behind, key=lambda it: it.max_scaled)
            adv.advance(pivot_doc)
            live = [it for it in live if it.doc != NO_MORE_DOCS]

    return coll.result()
