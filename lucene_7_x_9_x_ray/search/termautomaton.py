"""TermAutomatonQuery: token-level automaton matching.

Re-creates the sandbox TermAutomatonQuery (s84 sandbox/src/java/org/
apache/lucene/search/TermAutomatonQuery.java + TermAutomatonScorer.java):
states + term-labelled transitions form an automaton over consecutive
token positions; a document's frequency is the number of ACCEPT EVENTS —
every time stepping a token moves some in-flight run (or a fresh run
seeded at that position, TermAutomatonScorer.java:313-334) into an accept
state. Equivalently: the number of (start, end) substring occurrences of
any accepted token string. Scoring matches TermAutomatonWeight
(java:371-396): one SimScorer whose idf is the sum of the per-term idfs
over termIDs IN ID ORDER, skipping df == 0 terms, scored against the
automaton freq and the field norm.

Scope notes vs the reference:
- the builder determinizes at finish() (subset construction — the
  reference calls Operations.determinize);
- ANY transitions (anyTermID) are not supported: they need
  token-at-every-position access, which the postings index doesn't store
  (the reference reads them from a special ANY postings enum). Raises.
- in-flight runs die across position gaps exactly like the reference
  (states parked at a position that is never processed are dropped).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


class TermAutomatonBuilder:
    """Mirror of TermAutomatonQuery's builder surface: createState /
    addTransition / setAccept / finish."""

    def __init__(self):
        self._n_states = 0
        self._accepts: set[int] = set()
        self._trans: list[tuple[int, int, str]] = []  # (from, to, term)
        self._term_ids: dict[str, int] = {}  # insertion order = termID

    def create_state(self) -> int:
        s = self._n_states
        self._n_states += 1
        return s

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self._accepts.add(state)
        else:
            self._accepts.discard(state)

    def add_transition(self, source: int, dest: int, term: str) -> None:
        if term not in self._term_ids:
            self._term_ids[term] = len(self._term_ids)
        self._trans.append((source, dest, term))

    def add_any_transition(self, source: int, dest: int) -> None:
        raise NotImplementedError(
            "ANY transitions need token-at-every-position access "
            "(TermAutomatonQuery anyTermID) — not supported"
        )

    def finish(self) -> "TermAutomatonQuery":
        """Determinize (subset construction from state 0) and freeze."""
        nfa: dict[tuple[int, str], set[int]] = {}
        for src, dst, term in self._trans:
            nfa.setdefault((src, term), set()).add(dst)
        terms = list(self._term_ids)
        start = frozenset({0})
        subset_id = {start: 0}
        worklist = [start]
        dfa_trans: dict[tuple[int, str], int] = {}
        accepts: set[int] = set()
        if self._accepts & start:
            accepts.add(0)
        while worklist:
            subset = worklist.pop()
            sid = subset_id[subset]
            for term in terms:
                nxt = frozenset(
                    d for s in subset for d in nfa.get((s, term), ())
                )
                if not nxt:
                    continue
                if nxt not in subset_id:
                    subset_id[nxt] = len(subset_id)
                    worklist.append(nxt)
                    if self._accepts & nxt:
                        accepts.add(subset_id[nxt])
                dfa_trans[(sid, term)] = subset_id[nxt]
        return TermAutomatonQuery(
            transitions=tuple(sorted((s, t, d) for (s, t), d in dfa_trans.items())),
            accepts=tuple(sorted(accepts)),
            terms=tuple(terms),
        )


@dataclass(frozen=True)
class TermAutomatonQuery:
    """Determinized term automaton: transitions (state, term, next),
    accept-state ids, and terms in termID (insertion) order — the order
    the reference sums TermStatistics idfs in."""

    transitions: tuple[tuple[int, str, int], ...]
    accepts: tuple[int, ...]
    terms: tuple[str, ...]
    boost: float = 1.0
    field: str = ""


def eval_term_automaton(reader, query: TermAutomatonQuery, stats, bm25):
    """(docs, float32 scores) for the automaton over one reader — the
    TermAutomatonScorer run loop. Candidates are the union of the terms'
    doc lists; per candidate the (position, term) events step a multiset
    of in-flight DFA states (multiplicity = number of distinct run starts
    currently in that state, PosState.add does not dedup), counting every
    entry into an accept state. Gate-scale per-doc loop; the 100 TB path
    runs the same DFA as a batched bitmask table over token-id arrays."""
    from .scorers import _empty, _view, sum_idf_weight

    fr = _view(reader, query.field)
    if not getattr(fr, "has_positions", False):
        raise ValueError(
            "TermAutomatonQuery requires an index built with index_positions=True"
        )
    step = {(s, t): d for s, t, d in query.transitions}
    accept = set(query.accepts)

    per_term: dict[str, tuple] = {}
    for t in set(query.terms):
        tpp = fr.term_positions(t)
        if tpp is not None:
            per_term[t] = tpp
    if not per_term:
        return _empty()

    cand = np.unique(np.concatenate([d for d, _f, _p in per_term.values()]))
    offs = {
        t: np.concatenate(([0], np.cumsum(f))) for t, (d, f, _p) in per_term.items()
    }
    freqs = np.zeros(len(cand), dtype=np.float64)
    for ci, doc in enumerate(cand):
        events: list[tuple[int, str]] = []
        for t, (docs_t, _f, pos_t) in per_term.items():
            li = int(np.searchsorted(docs_t, doc))
            if li < len(docs_t) and docs_t[li] == doc:
                o = offs[t]
                events.extend((int(p), t) for p in pos_t[o[li] : o[li + 1]])
        events.sort()
        freq = 0
        cur: dict[int, int] = {}
        prev_pos = None
        i = 0
        while i < len(events):
            pos = events[i][0]
            if prev_pos is not None and pos != prev_pos + 1:
                cur = {}  # gap: parked runs are never processed again
            nxt: dict[int, int] = {}
            while i < len(events) and events[i][0] == pos:
                t = events[i][1]
                for state, cnt in cur.items():
                    ns = step.get((state, t))
                    if ns is not None:
                        nxt[ns] = nxt.get(ns, 0) + cnt
                        if ns in accept:
                            freq += cnt
                ns = step.get((0, t))  # fresh run from this position
                if ns is not None:
                    nxt[ns] = nxt.get(ns, 0) + 1
                    if ns in accept:
                        freq += 1
                i += 1
            cur = nxt
            prev_pos = pos
        freqs[ci] = freq

    keep = freqs > 0
    cand, freqs = cand[keep], freqs[keep]
    if len(cand) == 0:
        return _empty()
    # idf over termIDs in ID order, df == 0 terms excluded
    # (TermAutomatonQuery.java:384: only ts.docFreq() > 0 contribute)
    live_terms = [t for t in query.terms if stats.df(t, query.field) > 0]
    tw = sum_idf_weight(live_terms, query.field, stats, bm25, query.boost)
    scores = tw.score(freqs, fr.norms[cand]).astype(np.float32, copy=False)
    return cand, scores
