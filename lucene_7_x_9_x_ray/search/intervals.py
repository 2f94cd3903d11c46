"""Minimal-interval queries (the queries/intervals module).

Behavioral references (semantics recreated; iterator state machines are
literal transcriptions so duplicate-term and overlap edge cases match):

- ``queries/src/java/org/apache/lucene/queries/intervals/OrderedIntervalsSource.java``
  (s84 :88-155): lazy minimal ordered intervals — Vigna's algorithm; the
  candidate interval keeps shrinking until proven minimal. DOCUMENTED
  DEVIATION: the 8.4 transcription carries stale sub-iterator state
  across ``nextInterval`` calls and can emit phantom intervals for >= 3
  clauses (e.g. t0=[6,14,15,19] t1=[5,9,10,14,19] t2=[2,4,16,19] yields
  a spurious (15,16) with no t1 inside; the bug class was fixed later in
  the 7.x-9.x series, LUCENE-9257). We implement the algorithm's stated
  contract — the containment antichain of ordered matches — via a greedy
  chain + shrink-until-the-end-moves loop, duel-tested against a
  brute-force antichain enumeration.
- ``UnorderedIntervalsSource.java:92-192``: priority queue keyed
  (start asc, end desc); queueEnd tracks the right extreme; the candidate
  is minimized by popping the leftmost sub-iterator while the right
  extreme stands still.
- ``TermIntervalsSource.java:64-135``: term leaf — one position stream,
  start == end == position.
- ``FilteredIntervalsSource.java`` + ``IntervalFilter``: maxgaps / maxwidth
  accept-loops over the wrapped iterator (filtering AFTER minimization).
- ``IntervalScorer.java:52-70``: per-doc freq = Σ over enumerated
  intervals of ``1 / max(length - minExtent + 1, 1)``.
- ``IntervalQuery.java:75-76`` + ``IntervalScoreFunction.java:66-75``:
  default score = saturation(pivot=1): ``weight * (1 - pivot/(pivot+freq))``
  in float32 (the 1 - k/(f+k) rewriting).

- ``DisjunctionIntervalsSource.java:138-220``: priority queue keyed
  (end asc, start desc); emits the union's containment antichain in
  end order, advancing any sub whose current interval contains the one
  just emitted (dedupes equal intervals across subs).
- ``ContainingIntervalsSource.java:42-62`` / ``ContainedByIntervalsSource``
  / ``NotContainingIntervalsSource`` / ``NotContainedByIntervalsSource``:
  relative filters over two minimal streams. DOCUMENTED DEVIATION: for
  NOT_CONTAINING, 8.4's RelativeIterator drops a minuend interval whenever
  the subtrahend's current START falls inside it (``b.start <= a.end``),
  which also kills straddlers that are NOT contained (e.g. minuend (2,10)
  vs subtrahend (3,20)); we implement the stated contract — drop a iff
  some subtrahend interval is contained in it — using the antichain
  property (first b with b.start >= a.start has the minimal end).

Scope (documented): Term / Ordered / Unordered(overlaps allowed) /
MaxGaps / MaxWidth / Disjunction / Containing / ContainedBy /
NotContaining / NotContainedBy — the Intervals.term/ordered/unordered/
maxgaps/maxwidth/or/containing/containedBy/notContaining/notContainedBy
factory surface. The analyzed-text helpers and multi-term
(wildcard-expanded) sources are out of scope.

Scale shape: an IntervalQuery evaluates per segment exactly like
PhraseQuery (conjunction of postings, per-candidate position streams);
it serves from the single searcher, the merged searcher and the sharded
pool through the same eval_query dispatch.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

# Java NO_MORE_INTERVALS = Integer.MAX_VALUE; the ordered algorithm's
# right bound b starts at the same value, and the `end() >= b` checks
# rely on the two being equal — keep one shared sentinel.
NO_MORE = (1 << 62) - 1


# --- sources (frozen: hashable query components) ----------------------------


class IntervalsSource:
    def min_extent(self) -> int:
        raise NotImplementedError

    def terms(self) -> tuple[str, ...]:
        raise NotImplementedError

    def iterator(self, leaf_positions: dict[str, np.ndarray]):
        raise NotImplementedError

    def candidate_docs(self, per_term_docs: dict[str, np.ndarray]) -> np.ndarray:
        """Sorted local docIDs where this source can produce >= 1 interval
        (the two-phase approximation: ConjunctionDISI for AND-shaped
        sources, DisjunctionDISIApproximation for OR, the minuend alone
        for difference sources)."""
        raise NotImplementedError


def _intersect_docs(sources, per_term_docs) -> np.ndarray:
    out = None
    for s in sources:
        d = s.candidate_docs(per_term_docs)
        out = d if out is None else np.intersect1d(out, d, assume_unique=True)
        if len(out) == 0:
            break
    return out if out is not None else np.empty(0, dtype=np.int64)


@dataclass(frozen=True)
class TermInterval(IntervalsSource):
    term: str

    def min_extent(self) -> int:
        return 1

    def terms(self) -> tuple[str, ...]:
        return (self.term,)

    def iterator(self, leaf_positions):
        return _TermIt(leaf_positions[self.term])

    def candidate_docs(self, per_term_docs):
        return per_term_docs[self.term]


@dataclass(frozen=True)
class OrderedIntervals(IntervalsSource):
    sources: tuple

    def min_extent(self) -> int:
        return sum(s.min_extent() for s in self.sources)

    def terms(self) -> tuple[str, ...]:
        return tuple(t for s in self.sources for t in s.terms())

    def iterator(self, leaf_positions):
        return _OrderedIt([s.iterator(leaf_positions) for s in self.sources])

    def candidate_docs(self, per_term_docs):
        return _intersect_docs(self.sources, per_term_docs)


@dataclass(frozen=True)
class UnorderedIntervals(IntervalsSource):
    sources: tuple

    def min_extent(self) -> int:
        return sum(s.min_extent() for s in self.sources)

    def terms(self) -> tuple[str, ...]:
        return tuple(t for s in self.sources for t in s.terms())

    def iterator(self, leaf_positions):
        return _UnorderedIt([s.iterator(leaf_positions) for s in self.sources])

    def candidate_docs(self, per_term_docs):
        return _intersect_docs(self.sources, per_term_docs)


@dataclass(frozen=True)
class MaxGapsIntervals(IntervalsSource):
    max_gaps: int
    source: IntervalsSource

    def min_extent(self) -> int:
        return self.source.min_extent()

    def terms(self) -> tuple[str, ...]:
        return self.source.terms()

    def iterator(self, leaf_positions):
        it = self.source.iterator(leaf_positions)
        return _FilterIt(it, lambda: it.gaps() <= self.max_gaps)

    def candidate_docs(self, per_term_docs):
        return self.source.candidate_docs(per_term_docs)


@dataclass(frozen=True)
class MaxWidthIntervals(IntervalsSource):
    max_width: int
    source: IntervalsSource

    def min_extent(self) -> int:
        return self.source.min_extent()

    def terms(self) -> tuple[str, ...]:
        return self.source.terms()

    def iterator(self, leaf_positions):
        it = self.source.iterator(leaf_positions)
        return _FilterIt(it, lambda: it.end() - it.start() + 1 <= self.max_width)

    def candidate_docs(self, per_term_docs):
        return self.source.candidate_docs(per_term_docs)


@dataclass(frozen=True)
class DisjunctionIntervals(IntervalsSource):
    """Intervals.or (DisjunctionIntervalsSource): the union's containment
    antichain, emitted in (end asc) order."""

    sources: tuple

    def min_extent(self) -> int:
        return min(s.min_extent() for s in self.sources)

    def terms(self) -> tuple[str, ...]:
        return tuple(t for s in self.sources for t in s.terms())

    def iterator(self, leaf_positions):
        subs = [s.iterator(leaf_positions) for s in self.sources]
        return _DisjunctionIt(subs)

    def candidate_docs(self, per_term_docs):
        parts = [s.candidate_docs(per_term_docs) for s in self.sources]
        parts = [p for p in parts if len(p)]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))


@dataclass(frozen=True)
class ContainingIntervals(IntervalsSource):
    """Intervals.containing(big, small): big's minimal intervals that
    contain an interval of small (conjunction: both sides required)."""

    big: IntervalsSource
    small: IntervalsSource

    def min_extent(self) -> int:
        return self.big.min_extent()

    def terms(self) -> tuple[str, ...]:
        return self.big.terms() + self.small.terms()

    def iterator(self, leaf_positions):
        return _ContainFilterIt(
            self.big.iterator(leaf_positions),
            self.small.iterator(leaf_positions),
            keep_if_contains=True,
        )

    def candidate_docs(self, per_term_docs):
        return _intersect_docs((self.big, self.small), per_term_docs)


@dataclass(frozen=True)
class NotContainingIntervals(IntervalsSource):
    """Intervals.notContaining(minuend, subtrahend): minuend intervals with
    NO subtrahend interval inside (difference: subtrahend optional). See
    module docstring for the deviation from 8.4's straddler edge."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def min_extent(self) -> int:
        return self.minuend.min_extent()

    def terms(self) -> tuple[str, ...]:
        return self.minuend.terms() + self.subtrahend.terms()

    def iterator(self, leaf_positions):
        return _ContainFilterIt(
            self.minuend.iterator(leaf_positions),
            self.subtrahend.iterator(leaf_positions),
            keep_if_contains=False,
        )

    def candidate_docs(self, per_term_docs):
        return self.minuend.candidate_docs(per_term_docs)


@dataclass(frozen=True)
class ContainedByIntervals(IntervalsSource):
    """Intervals.containedBy(small, big): small's minimal intervals that lie
    inside an interval of big (conjunction)."""

    small: IntervalsSource
    big: IntervalsSource

    def min_extent(self) -> int:
        return self.small.min_extent()

    def terms(self) -> tuple[str, ...]:
        return self.small.terms() + self.big.terms()

    def iterator(self, leaf_positions):
        return _CoverFilterIt(
            self.small.iterator(leaf_positions),
            self.big.iterator(leaf_positions),
            keep_if_covered=True,
        )

    def candidate_docs(self, per_term_docs):
        return _intersect_docs((self.small, self.big), per_term_docs)


@dataclass(frozen=True)
class NotContainedByIntervals(IntervalsSource):
    """Intervals.notContainedBy(minuend, subtrahend): minuend intervals NOT
    inside any subtrahend interval (difference: subtrahend optional)."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource

    def min_extent(self) -> int:
        return self.minuend.min_extent()

    def terms(self) -> tuple[str, ...]:
        return self.minuend.terms() + self.subtrahend.terms()

    def iterator(self, leaf_positions):
        return _CoverFilterIt(
            self.minuend.iterator(leaf_positions),
            self.subtrahend.iterator(leaf_positions),
            keep_if_covered=False,
        )

    def candidate_docs(self, per_term_docs):
        return self.minuend.candidate_docs(per_term_docs)


# --- per-doc iterators (literal transcriptions) ------------------------------


class _TermIt:
    """TermIntervalsSource.intervals (s84 :64-135): one position stream."""

    __slots__ = ("positions", "upto", "pos")

    def __init__(self, positions: np.ndarray):
        self.positions = positions
        self.upto = 0
        self.pos = -1

    def start(self) -> int:
        return self.pos

    def end(self) -> int:
        return self.pos

    def gaps(self) -> int:
        return 0

    def next_interval(self) -> int:
        if self.upto >= len(self.positions):
            self.pos = NO_MORE
            return NO_MORE
        self.pos = int(self.positions[self.upto])
        self.upto += 1
        return self.pos


class _OrderedIt:
    """OrderedIntervalsSource.OrderedIntervalIterator (s84 :88-155),
    implemented to the stated minimal-interval contract (see module
    docstring for the deviation from 8.4's stale-state edge case).

    Invariant between calls: subs[0] sits on the next candidate start and
    subs[1..] are greedily chained past their predecessors (each sub's
    interval is the first one starting after the previous sub's end), so
    (subs[0].start(), subs[-1].end()) is the minimal-end match for that
    start. A candidate is emitted once advancing subs[0] strictly grows
    the chained end — same-end successors contain-and-replace it
    (Vigna's shrink step)."""

    def __init__(self, subs):
        self.subs = subs
        self._start = self._end = self.first_end = -1
        self._gaps = 0
        self._done = subs[0].next_interval() == NO_MORE or not self._chain()

    def _chain(self) -> bool:
        """Advance subs[1..] to the first interval after the predecessor.
        Monotone: sub-iterators only move forward across calls."""
        subs = self.subs
        for i in range(1, len(subs)):
            while subs[i].start() <= subs[i - 1].end():
                if subs[i].next_interval() == NO_MORE:
                    return False
        return True

    def start(self) -> int:
        return self._start

    def end(self) -> int:
        return self._end

    def gaps(self) -> int:
        return self._gaps

    def next_interval(self) -> int:
        if self._done:
            self._start = self._end = NO_MORE
            return NO_MORE
        subs = self.subs
        while True:
            start = subs[0].start()
            first_end = subs[0].end()
            end = subs[-1].end()
            gaps = 0
            if len(subs) > 1:
                gaps = subs[1].start() - first_end - 1
                for i in range(2, len(subs)):
                    gaps += subs[i].start() - subs[i - 1].end() - 1
            # shrink step: a same-end match starting later is contained in
            # this one; keep chaining until the end moves (or input ends)
            if subs[0].next_interval() == NO_MORE or not self._chain():
                self._done = True
            elif subs[-1].end() <= end:
                continue
            self._start, self.first_end, self._end = start, first_end, end
            self._gaps = gaps
            return start


class _UnorderedIt:
    """UnorderedIntervalsSource.UnorderedIntervalIterator (s84 :92-192).
    Queue order (start asc, end desc) is encoded in the pushed key; keys
    are recomputed on every push, matching the reference's pop/advance/add
    discipline (values never mutate while queued)."""

    def __init__(self, subs):
        self.subs = subs
        self.queue: list[tuple[int, int, int]] = []  # (start, -end, idx)
        self.queue_end = -1
        self._start = self._end = self.first_end = -1
        # reset()
        for idx, it in enumerate(subs):
            if it.next_interval() == NO_MORE:
                break
            self._push(idx)
            self._update_right(it)

    def _push(self, idx):
        it = self.subs[idx]
        heapq.heappush(self.queue, (it.start(), -it.end(), idx))

    def _update_right(self, it):
        e = it.end()
        if e > self.queue_end:
            self.queue_end = e

    def start(self) -> int:
        return self._start

    def end(self) -> int:
        return self._end

    def gaps(self) -> int:
        inner = []
        for it in self.subs:
            if it.end() > self._end:
                inner.append((self._start, self.first_end))
            else:
                inner.append((it.start(), it.end()))
        flat = sorted(p for pair in inner for p in pair)
        g = 0
        for i in range(1, len(self.subs)):
            g += flat[i * 2] - flat[i * 2 - 1] - 1
        return g

    def next_interval(self) -> int:
        subs, queue = self.subs, self.queue
        # first, find a matching interval
        while len(queue) == len(subs) and queue[0][0] == self._start:
            _s, _e, idx = heapq.heappop(queue)
            if subs[idx].next_interval() != NO_MORE:
                self._push(idx)
                self._update_right(subs[idx])
        if len(queue) < len(subs):
            self._start = self._end = NO_MORE
            return NO_MORE
        # then, minimize it
        while True:
            top = queue[0]
            self._start = top[0]
            self.first_end = -top[1]
            self._end = self.queue_end
            if -top[1] == self._end:
                return self._start
            _s, _e, idx = heapq.heappop(queue)
            if subs[idx].next_interval() != NO_MORE:
                self._push(idx)
                self._update_right(subs[idx])
            if not (len(queue) == len(subs) and self._end == self.queue_end):
                return self._start


class _DisjunctionIt:
    """DisjunctionIntervalsSource.DisjunctionIntervalIterator (s84
    :138-220): queue keyed (end asc, start desc) so the contained interval
    surfaces first at equal ends; after emitting, every sub whose current
    interval CONTAINS the emitted one advances (including the emitter
    itself — the self-advance rides the same sweep). Emits the union's
    containment antichain in end order; duplicates across subs collapse.
    Values snapshot at emission because the sweep advances sub-iterators."""

    def __init__(self, subs):
        self.subs = subs
        self.queue: list[tuple[int, int, int]] = []  # (end, -start, idx)
        for idx, it in enumerate(subs):
            if it.next_interval() != NO_MORE:
                heapq.heappush(self.queue, (it.end(), -it.start(), idx))
        self._started = False
        self._start = self._end = -1
        self._gaps = 0

    def start(self) -> int:
        return self._start

    def end(self) -> int:
        return self._end

    def gaps(self) -> int:
        return self._gaps

    def _snapshot(self) -> int:
        e, ns, idx = self.queue[0]
        it = self.subs[idx]
        self._start, self._end, self._gaps = it.start(), it.end(), it.gaps()
        return self._start

    def next_interval(self) -> int:
        q, subs = self.queue, self.subs
        if not self._started:
            self._started = True
            if not q:
                self._start = self._end = NO_MORE
                return NO_MORE
            return self._snapshot()
        if self._start == NO_MORE:
            return NO_MORE
        start, end = self._start, self._end
        # advance every sub whose current interval contains the emitted one
        while q and start >= -q[0][1] and end <= q[0][0]:
            _e, _ns, idx = heapq.heappop(q)
            if subs[idx].next_interval() != NO_MORE:
                heapq.heappush(q, (subs[idx].end(), -subs[idx].start(), idx))
        if not q:
            self._start = self._end = NO_MORE
            return NO_MORE
        return self._snapshot()


class _ContainFilterIt:
    """CONTAINING / NOT_CONTAINING over two minimal streams: keep a minuend
    interval iff (some subtrahend interval lies inside it) == polarity.
    Subtrahend intervals with start < a.start are advanced past (they can
    never sit inside this or any later minuend interval — starts only
    grow); after that, the antichain property makes the FIRST remaining
    subtrahend interval the one with the minimal end, so containment is
    exactly ``b.start <= a.end and b.end <= a.end``
    (ContainingIntervalsSource.java:46-61 semantics; see module docstring
    for the NOT_CONTAINING straddler deviation)."""

    def __init__(self, big, small, keep_if_contains: bool):
        self.a = big
        self.b = small
        self.keep = keep_if_contains
        self.b_alive = self.b.next_interval() != NO_MORE

    def start(self) -> int:
        return self.a.start()

    def end(self) -> int:
        return self.a.end()

    def gaps(self) -> int:
        return self.a.gaps()

    def next_interval(self) -> int:
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while self.b_alive and b.start() < a.start():
                self.b_alive = b.next_interval() != NO_MORE
            contains = self.b_alive and b.end() <= a.end()
            if contains == self.keep:
                return a.start()
        return NO_MORE


class _CoverFilterIt:
    """CONTAINED_BY / NOT_CONTAINED_BY: keep a minuend interval iff (some
    subtrahend interval covers it) == polarity. Subtrahend intervals ending
    before a.end can cover neither this nor any later minuend interval;
    the first with b.end >= a.end has the smallest start among the rest,
    so coverage is exactly ``b.start <= a.start``
    (ContainedByIntervalsSource.java:47-63)."""

    def __init__(self, small, big, keep_if_covered: bool):
        self.a = small
        self.b = big
        self.keep = keep_if_covered
        self.b_alive = self.b.next_interval() != NO_MORE

    def start(self) -> int:
        return self.a.start()

    def end(self) -> int:
        return self.a.end()

    def gaps(self) -> int:
        return self.a.gaps()

    def next_interval(self) -> int:
        a, b = self.a, self.b
        while a.next_interval() != NO_MORE:
            while self.b_alive and b.end() < a.end():
                self.b_alive = b.next_interval() != NO_MORE
            covered = self.b_alive and b.start() <= a.start()
            if covered == self.keep:
                return a.start()
        return NO_MORE


class _FilterIt:
    """IntervalFilter: skip intervals the predicate rejects (filtering the
    already-minimized stream — FilteredIntervalsSource.java:95-105)."""

    def __init__(self, inner, accept):
        self.inner = inner
        self.accept = accept

    def start(self) -> int:
        return self.inner.start()

    def end(self) -> int:
        return self.inner.end()

    def gaps(self) -> int:
        return self.inner.gaps()

    def next_interval(self) -> int:
        while True:
            nxt = self.inner.next_interval()
            if nxt == NO_MORE or self.accept():
                return nxt


# --- evaluation ---------------------------------------------------------------


def interval_freq(source: IntervalsSource, positions: dict[str, np.ndarray]) -> float:
    """IntervalScorer.ensureFreqComputed (s84 :62-70): float32 sum of
    1/max(length - minExtent + 1, 1) over the enumerated intervals."""
    it = source.iterator(positions)
    me = source.min_extent()
    freq = np.float32(0.0)
    while it.next_interval() != NO_MORE:
        length = it.end() - it.start() + 1
        freq = np.float32(freq + np.float32(1.0) / np.float32(max(length - me + 1, 1)))
    return float(freq)


def eval_interval_query(reader, query, stats, bm25):
    """IntervalQuery over one segment: conjunction of the source's term
    postings -> per-candidate minimal-interval freq -> saturation score
    (IntervalQuery.java:75, IntervalScoreFunction.SaturationFunction).
    Returns (local docIDs ascending, float32 scores)."""
    from .scorers import _empty, _view

    fr = _view(reader, query.field)
    if not getattr(fr, "has_positions", False):
        raise ValueError(
            "IntervalQuery requires an index built with index_positions=True"
        )
    _EMPTY_POS = np.empty(0, dtype=np.int64)
    leaf_terms = sorted(set(query.source.terms()))
    per_term = {}
    for t in leaf_terms:
        tpp = fr.term_positions(t)
        if tpp is None:
            # absent term: empty postings — OR / difference sources can
            # still match (the leaf contributes no intervals)
            tpp = (_EMPTY_POS, _EMPTY_POS, _EMPTY_POS)
        per_term[t] = tpp

    cand = query.source.candidate_docs({t: per_term[t][0] for t in leaf_terms})
    if len(cand) == 0:
        return _empty()

    locs, offs, present = {}, {}, {}
    for t in leaf_terms:
        d, f, _p = per_term[t]
        off = np.zeros(len(f) + 1, dtype=np.int64)
        np.cumsum(f, out=off[1:])
        li = np.minimum(np.searchsorted(d, cand), max(len(d) - 1, 0))
        locs[t] = li
        offs[t] = off
        present[t] = (d[li] == cand) if len(d) else np.zeros(len(cand), dtype=bool)

    pivot = np.float32(query.pivot)
    weight = np.float32(query.boost)
    out_docs, out_scores = [], []
    for ci in range(len(cand)):
        positions = {}
        for t in leaf_terms:
            if present[t][ci]:
                li = locs[t][ci]
                positions[t] = per_term[t][2][offs[t][li] : offs[t][li + 1]]
            else:
                positions[t] = _EMPTY_POS
        freq = np.float32(interval_freq(query.source, positions))
        if freq <= 0.0:
            continue
        score = weight * (np.float32(1.0) - pivot / (pivot + freq))
        out_docs.append(int(cand[ci]))
        out_scores.append(score)
    if not out_docs:
        return _empty()
    return (
        np.asarray(out_docs, dtype=np.int64),
        np.asarray(out_scores, dtype=np.float32),
    )
