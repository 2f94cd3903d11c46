"""Monitor module: registered-query percolation over a document stream
(s84 lucene/monitor — Monitor.java, TermFilteredPresearcher.java:65,
QueryDecomposer.java:34, QueryIndex.java), re-expressed Ray-Data-first.

The reference registers MonitorQuery(id, query) instances, decomposes
top-level disjunctions into separately-indexed subqueries
(QueryDecomposer), and indexes ONE representative term per conjunction
chosen by a TermWeightor (TermFilteredPresearcher.buildQuery) — queries
whose terms cannot be extracted (wildcards, MatchAll) index the
``__ANYTOKEN__`` sentinel and are checked against every document. A
document batch then builds a disjunction of its own terms, retrieves the
candidate queries, and confirms each against an in-RAM index of the batch
(DocumentBatch / MemoryIndex).

Ray-Data shape: the registered queries are SMALL and the document stream
is HUGE, so the query index is per-actor state — a callable class whose
``__init__`` parses the queries once and builds the (field, term) ->
query-ids map (the QueryIndex role), and whose ``__call__`` percolates
one Arrow batch: a vectorized candidate lookup over the batch's distinct
(doc, term) pairs (explode + np.isin, no per-row Python), then
MemoryIndex confirmation only for the pruned (doc, candidate) pairs.
Work scales with candidate volume, not |queries| x |docs|; the corpus
never shuffles and the stage streams with backpressure. At 100 TB the
identical stage runs with ``concurrency=N`` actors, the query set
broadcast once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.analysis import get_analyzer
from ..search import queries as Q
from ..sources.pages import TITLE_TOKENS
from .common import sized_read

ANYTOKEN = "__ANYTOKEN__"

# the registered query set (MonitorQuery(id, query-string)); strings go
# through the classic parser at registration, like MonitorQuery's parser
MONITOR_QUERIES: tuple[tuple[str, str], ...] = (
    ("q_term", "hash"),
    ("q_and", "key AND table"),
    ("q_or", "window OR stream"),
    ("q_not", "scan AND NOT merge"),
    ("q_phrase", '"batch batch"'),
    ("q_title", "title:key"),
    ("q_prefix", "wind*"),  # no term extraction -> ANYTOKEN path
    ("q_mix", "+key stream window"),  # MUST gates; SHOULDs score-only
)


def _weight(term: str) -> tuple[int, str]:
    """TermWeightor stand-in: longer tokens are rarer/more selective
    (TermWeightor.DEFAULT weights by token length); ties break on the
    term itself for determinism."""
    return (len(term), term)


def extract_presearch_terms(query) -> list[tuple[str, str]] | None:
    """QueryAnalyzer + TermFilteredPresearcher term extraction: returns
    the DISJUNCT list of (field, term) — a doc can only match the query
    if it contains AT LEAST ONE of them — or None for ANYTOKEN (the query
    must be checked against every doc).

    - disjunction (SHOULD-only, msm<=1): union of the children's
      disjuncts (QueryDecomposer.decompose splits these into separately
      indexed subqueries); ANYTOKEN child -> ANYTOKEN whole.
    - conjunction (any MUST/FILTER): ONE child is indexed — the one
      whose weakest disjunct is strongest (the weightor's selectivity
      choice); MUST_NOT children never gate.
    - phrase: a conjunction of its terms -> single best term.
    - multi-term (prefix/wildcard/regexp/fuzzy/range) and MatchAll:
      ANYTOKEN (no CustomQueryHandler configured, the reference default
      for RegexpQueryHandler-less setups).
    """
    if isinstance(query, Q.TermQuery):
        return [(query.field, query.term)]
    if isinstance(query, Q.PhraseQuery):
        if not query.terms:
            return None
        best = max(query.terms, key=_weight)
        return [(query.field, best)]
    if isinstance(query, Q.BooleanQuery):
        musts = [c.query for c in query.clauses
                 if c.occur in (Q.MUST, Q.FILTER)]
        shoulds = [c.query for c in query.clauses if c.occur == Q.SHOULD]
        if musts:
            # conjunction: pick the most selective extractable child
            best: list[tuple[str, str]] | None = None
            for child in musts:
                d = extract_presearch_terms(child)
                if d is None:
                    continue
                if best is None or min(_weight(t) for _, t in d) > min(
                    _weight(t) for _, t in best
                ):
                    best = d
            return best
        if shoulds and query.min_should_match <= 1:
            out: list[tuple[str, str]] = []
            for child in shoulds:
                d = extract_presearch_terms(child)
                if d is None:
                    return None
                out.extend(d)
            return out
        if shoulds:  # msm > 1: safe superset — any SHOULD term
            out = []
            for child in shoulds:
                d = extract_presearch_terms(child)
                if d is None:
                    return None
                out.extend(d)
            return out
        return None  # MUST_NOT-only / empty: never prunable
    return None  # MatchAll / multi-term queries


class Percolator:
    """Actor-pool percolation stage (map_batches callable class): parse
    and index the registered queries ONCE per actor (__init__), percolate
    per batch (__call__) -> (doc_id, query_id) match rows."""

    def __init__(self, specs: tuple[tuple[str, str], ...] = MONITOR_QUERIES,
                 analyzer: str = "standard"):
        self.analyzer = get_analyzer(analyzer)
        self.parsed: dict[str, Q.Query] = {}
        self.term_map: dict[tuple[str, str], list[str]] = {}
        self.anytoken: list[str] = []
        for qid, qs in specs:
            query = Q.parse_classic(qs, self.analyzer)
            self.parsed[qid] = query
            disjuncts = extract_presearch_terms(query)
            if disjuncts is None:
                self.anytoken.append(qid)
            else:
                for key in disjuncts:
                    self.term_map.setdefault(key, []).append(qid)
        # vectorized lookup arrays per field
        self._fields: dict[str, tuple[np.ndarray, list[list[str]]]] = {}
        by_field: dict[str, dict[str, list[str]]] = {}
        for (f, t), qids in self.term_map.items():
            by_field.setdefault(f, {})[t] = qids
        for f, tmap in by_field.items():
            terms = np.array(sorted(tmap), dtype="U")
            self._fields[f] = (terms, [tmap[t] for t in terms])

    def _accumulate(self, cands: list[set[str]], field: str,
                    toks_list: pa.Array) -> None:
        """Vectorized candidate lookup for one field: explode the batch's
        token lists, searchsorted against the query-term index, gather
        query ids — per-row Python only on the (rare) hits."""
        entry = self._fields.get(field)
        if entry is None:
            return
        terms, qid_lists = entry
        flat = pc.list_flatten(toks_list)
        if len(flat) == 0:
            return
        parents = pc.list_parent_indices(toks_list).to_numpy()
        toks = flat.to_numpy(zero_copy_only=False).astype("U")
        idx = np.searchsorted(terms, toks)
        idx[idx >= len(terms)] = 0
        hit = terms[idx] == toks
        for p, j in zip(parents[hit], idx[hit]):
            cands[int(p)].update(qid_lists[int(j)])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        toks = pc.split_pattern(batch["text"], pattern=" ")
        cands: list[set[str]] = [set(self.anytoken) for _ in range(n)]
        self._accumulate(cands, "", toks)
        self._accumulate(cands, "title", pc.list_slice(toks, 0, TITLE_TOKENS))
        # group the candidate pairs by QUERY and confirm each against ONE
        # in-RAM index of the whole batch (the reference's DocumentBatch
        # model, Monitor.match -> CandidateMatcher over a batch index) —
        # per-query vectorized masks instead of a per-doc MemoryIndex
        by_query: dict[str, list[int]] = {}
        for i, cs in enumerate(cands):
            for qid in cs:
                by_query.setdefault(qid, []).append(i)
        bidx = _BatchIndex(toks, n)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_doc: list[int] = []
        out_q: list[str] = []
        for qid in sorted(by_query):
            cand_rows = np.asarray(by_query[qid], dtype=np.int64)
            hit = bidx.eval(self.parsed[qid], cand_rows, batch)
            for i in hit:
                out_doc.append(int(doc_ids[int(i)]))
                out_q.append(qid)
        order = np.lexsort((np.asarray(out_q, dtype=object),
                            np.asarray(out_doc, dtype=np.int64))) \
            if out_doc else np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array([out_doc[i] for i in order], pa.int64()),
                "query_id": pa.array([out_q[i] for i in order], pa.string()),
            }
        )


class _BatchIndex:
    """One in-RAM inverted index over a WHOLE Arrow batch (the reference's
    DocumentBatch, DocumentBatch.java role): term -> (doc rows, positions)
    built with one vectorized explode + lexsort per field. Candidate
    queries evaluate as masks over their candidate rows — Term, Boolean,
    exact Phrase and Prefix natively; anything else falls back to a
    per-candidate-doc MemoryIndex (rare by construction)."""

    def __init__(self, toks, n: int):
        self.n = n
        self._fields: dict[str, tuple] = {}
        self._build("", toks)
        self._build("title", pc.list_slice(toks, 0, TITLE_TOKENS))

    def _build(self, field: str, toks_list) -> None:
        la = (toks_list.combine_chunks()
              if isinstance(toks_list, pa.ChunkedArray) else toks_list)
        flat = pc.list_flatten(la)
        parents = pc.list_parent_indices(la).to_numpy()
        m = len(parents)
        idxs = np.arange(m, dtype=np.int64)
        if m:
            run_start = np.zeros(m, dtype=np.int64)
            starts = np.flatnonzero(np.r_[True, parents[1:] != parents[:-1]])
            run_start[starts] = idxs[starts]
            run_start = np.maximum.accumulate(run_start)
            pos = idxs - run_start
        else:
            pos = idxs
        terms = flat.to_numpy(zero_copy_only=False).astype("U")
        order = np.lexsort((pos, parents, terms))
        t_sorted = terms[order]
        bounds = np.flatnonzero(np.r_[True, t_sorted[1:] != t_sorted[:-1]]) \
            if m else np.array([], dtype=np.int64)
        uniq = t_sorted[bounds] if m else np.array([], dtype="U")
        self._fields[field] = (
            uniq, np.r_[bounds, m], parents[order], pos[order]
        )

    def _slice(self, field: str, term: str) -> tuple[np.ndarray, np.ndarray]:
        uniq, bounds, parents, pos = self._fields[field]
        i = int(np.searchsorted(uniq, term))
        if i >= len(uniq) or uniq[i] != term:
            e = np.array([], dtype=np.int64)
            return e, e
        return parents[bounds[i]:bounds[i + 1]], pos[bounds[i]:bounds[i + 1]]

    def _term_docs(self, field: str, term: str) -> np.ndarray:
        p, _ = self._slice(field, term)
        return np.unique(p)

    def eval(self, query, cand: np.ndarray, batch: pa.Table) -> np.ndarray:
        """Rows of ``cand`` matching ``query`` (match-only semantics equal
        to MemoryIndex.match / scorers' boolean rules)."""
        mask = self._mask(query, cand, batch)
        return cand[mask]

    def _mask(self, query, cand: np.ndarray, batch) -> np.ndarray:
        if isinstance(query, Q.TermQuery):
            return np.isin(cand, self._term_docs(query.field, query.term))
        if isinstance(query, Q.MatchAllDocsQuery):
            return np.ones(len(cand), dtype=bool)
        if isinstance(query, Q.MatchNoDocsQuery):
            return np.zeros(len(cand), dtype=bool)
        if isinstance(query, Q.PrefixQuery):
            uniq = self._fields[""][0]
            lo = int(np.searchsorted(uniq, query.prefix))
            hi = int(np.searchsorted(uniq, query.prefix + "￿"))
            docs = [self._term_docs("", str(t)) for t in uniq[lo:hi]]
            hit = np.unique(np.concatenate(docs)) if docs else \
                np.array([], dtype=np.int64)
            return np.isin(cand, hit)
        if isinstance(query, Q.PhraseQuery) and query.slop == 0 \
                and len(query.terms) >= 1:
            return self._phrase_mask(query, cand)
        if isinstance(query, Q.BooleanQuery):
            musts = [c.query for c in query.clauses
                     if c.occur in (Q.MUST, Q.FILTER)]
            shoulds = [c.query for c in query.clauses if c.occur == Q.SHOULD]
            nots = [c.query for c in query.clauses if c.occur == Q.MUST_NOT]
            if musts:
                mask = np.ones(len(cand), dtype=bool)
                for q in musts:
                    mask &= self._mask(q, cand, batch)
                need = query.min_should_match
            else:
                mask = np.ones(len(cand), dtype=bool)
                need = max(1, query.min_should_match)
            if shoulds and need > 0:
                cnt = np.zeros(len(cand), dtype=np.int64)
                for q in shoulds:
                    cnt += self._mask(q, cand, batch)
                mask &= cnt >= need
            elif shoulds and not musts:
                cnt = np.zeros(len(cand), dtype=np.int64)
                for q in shoulds:
                    cnt += self._mask(q, cand, batch)
                mask &= cnt >= 1
            elif not musts and not shoulds:
                # MUST_NOT-only boolean matches nothing (scorers rule)
                mask = np.zeros(len(cand), dtype=bool)
            for q in nots:
                mask &= ~self._mask(q, cand, batch)
            return mask
        return self._fallback_mask(query, cand, batch)

    def _phrase_mask(self, query: Q.PhraseQuery, cand: np.ndarray) -> np.ndarray:
        field = query.field
        slices = [self._slice(field, t) for t in query.terms]
        alive = cand
        for p, _ in slices:
            alive = alive[np.isin(alive, np.unique(p))]
            if len(alive) == 0:
                break
        out = np.zeros(len(cand), dtype=bool)
        pos_c = np.searchsorted(cand, alive)
        for k, d in zip(pos_c, alive):
            p0, q0 = slices[0]
            cur = q0[p0 == d]
            for i in range(1, len(slices)):
                pi, qi = slices[i]
                cur = np.intersect1d(cur + 1, qi[pi == d],
                                     assume_unique=False)
                if len(cur) == 0:
                    break
            if len(cur):
                out[k] = True
        return out

    def _fallback_mask(self, query, cand: np.ndarray, batch) -> np.ndarray:
        from ..state.memindex import MemoryIndex

        texts = batch["text"].to_pylist()
        out = np.zeros(len(cand), dtype=bool)
        for k, d in enumerate(cand):
            body = texts[int(d)]
            mi = MemoryIndex(body)
            mi.add_field("title", " ".join(body.split(" ")[:TITLE_TOKENS]))
            out[k] = mi.match(query) is not None
        return out


def q_percolate(sf_dir: str) -> pa.Table:
    """Gate: percolate the documents stream against MONITOR_QUERIES ->
    (doc_id, query_id) match rows."""
    ds = sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    matched = ds.map_batches(
        Percolator, concurrency=(1, 8), batch_size=512,
        batch_format="pyarrow",
    )
    return pa.Table.from_pandas(
        matched.to_pandas(), preserve_index=False
    ).sort_by([("doc_id", "ascending"), ("query_id", "ascending")])
