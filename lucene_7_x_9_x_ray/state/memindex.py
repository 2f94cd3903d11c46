"""MemoryIndex: single-document throwaway index for percolation (s84
memory/src/java/org/apache/lucene/index/memory/MemoryIndex.java:177 —
re-created, not ported): analyze one document entirely in RAM, then run
any query against it to ask "does this stored query match this doc, and
how well?" — the alerting/percolator primitive.

The in-RAM structure duck-types the reader surface the exhaustive scorer
needs (term_postings/term_stats/term_positions/norms/doc_count/
field_view), so eval_query — and with it every query type the engine has,
including field-scoped and phrase queries — runs unchanged over it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.analysis import Analyzer, get_analyzer
from ..functions.smallfloat import int_to_byte4


@dataclass
class _MemPostings:
    doc_freq: int
    total_term_freq: int
    _freq: int

    def decode(self):
        return np.zeros(1, dtype=np.int64), np.asarray([self._freq], dtype=np.int64)


class _MemField:
    """One field's in-RAM inverted view over the single document."""

    def __init__(self, text: str, analyzer: Analyzer):
        tokens, _ = analyzer.tokenize_batch([text])
        self._positions: dict[str, np.ndarray] = {}
        for pos, tok in enumerate(tokens):
            self._positions.setdefault(tok, []).append(pos)  # type: ignore[arg-type]
        self._positions = {
            t: np.asarray(p, dtype=np.int64) for t, p in self._positions.items()
        }
        self.doc_count = 1
        self.doc_base = 0
        self.has_positions = True
        n_tokens = len(tokens)
        self.norms = int_to_byte4(np.asarray([n_tokens], dtype=np.int64))
        self.sum_total_term_freq = n_tokens
        self.terms = np.asarray(sorted(self._positions), dtype=object)

    def term_stats(self, term: str) -> tuple[int, int]:
        p = self._positions.get(term)
        return (1, len(p)) if p is not None else (0, 0)

    def term_postings(self, term: str):
        p = self._positions.get(term)
        if p is None:
            return None
        return _MemPostings(doc_freq=1, total_term_freq=len(p), _freq=len(p))

    def term_positions(self, term: str):
        p = self._positions.get(term)
        if p is None:
            return None
        return (
            np.zeros(1, dtype=np.int64),
            np.asarray([len(p)], dtype=np.int64),
            p,
        )


class MemoryIndex(_MemField):
    """The single-doc index; ``add_field`` attaches extra fields.

    ``match(query)`` returns the BM25 score if the doc matches, else None
    — statistics come from the memory index itself (docCount=1), as in
    the reference's MemoryIndex.search().
    """

    def __init__(self, text: str, analyzer: str | Analyzer = "standard"):
        self.analyzer = (
            get_analyzer(analyzer) if isinstance(analyzer, str) else analyzer
        )
        super().__init__(text, self.analyzer)
        self._fields: dict[str, _MemField] = {}

    def add_field(self, name: str, text: str) -> "MemoryIndex":
        self._fields[name] = _MemField(text, self.analyzer)
        return self

    def field_view(self, field: str):
        if not field:
            return self
        try:
            return self._fields[field]
        except KeyError:
            raise ValueError(f"MemoryIndex has no field {field!r}") from None

    def match(self, query) -> float | None:
        """Score of the single doc against ``query`` (None = no match)."""
        from ..functions.bm25 import BM25
        from ..search import queries as Q
        from ..search.scorers import CollectionStats, eval_query

        if isinstance(query, str):
            query = Q.parse_classic(query, self.analyzer)
        if Q.needs_rewrite(query):
            query = Q.rewrite(query, self.terms)
        pairs = Q.collect_field_terms(query)
        df: dict[str, int] = {}
        ttf: dict[str, int] = {}
        fdf: dict = {}
        fttf: dict = {}
        for f, t in pairs:
            view = self.field_view(f)
            d, tf = view.term_stats(t)
            if not f:
                df[t], ttf[t] = d, tf
            else:
                fdf[(f, t)], fttf[(f, t)] = d, tf
        stats = CollectionStats(
            1, self.sum_total_term_freq, df, ttf,
            field_df=fdf, field_ttf=fttf,
            field_sttf={k: v.sum_total_term_freq for k, v in self._fields.items()},
            field_doc_count={k: 1 for k in self._fields},
        )
        docs, scores = eval_query(self, query, stats, BM25())
        if len(docs) == 0:
            return None
        return float(scores[0])
