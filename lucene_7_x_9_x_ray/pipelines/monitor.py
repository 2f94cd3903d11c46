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
        from ..state.memindex import MemoryIndex

        n = batch.num_rows
        toks = pc.split_pattern(batch["text"], pattern=" ")
        cands: list[set[str]] = [set(self.anytoken) for _ in range(n)]
        self._accumulate(cands, "", toks)
        self._accumulate(cands, "title", pc.list_slice(toks, 0, TITLE_TOKENS))
        # MemoryIndex confirmation, candidate docs only (work is bounded
        # by the presearcher's candidate volume, not |queries| x |docs|)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_doc: list[int] = []
        out_q: list[str] = []
        for i in range(n):
            if not cands[i]:
                continue
            body = texts[i]
            mi = MemoryIndex(body, analyzer=self.analyzer)
            mi.add_field(
                "title", " ".join(body.split(" ")[:TITLE_TOKENS])
            )
            for qid in sorted(cands[i]):
                if mi.match(self.parsed[qid]) is not None:
                    out_doc.append(int(doc_ids[i]))
                    out_q.append(qid)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "query_id": pa.array(out_q, pa.string()),
            }
        )


def q_percolate(sf_dir: str) -> pa.Table:
    """Gate: percolate the documents stream against MONITOR_QUERIES ->
    (doc_id, query_id) match rows."""
    ds = sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    matched = ds.map_batches(
        Percolator, concurrency=(1, 4), batch_size=256,
        batch_format="pyarrow",
    )
    return pa.Table.from_pandas(
        matched.to_pandas(), preserve_index=False
    ).sort_by([("doc_id", "ascending"), ("query_id", "ascending")])
