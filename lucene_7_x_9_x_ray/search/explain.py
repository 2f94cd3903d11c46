"""Explanation trees: IndexSearcher.explain.

Re-creates the reference's explain surface (s84 core
search/IndexSearcher.java:714 explain(Query, int) +
search/Explanation.java match/value/description/details): a nested,
human-auditable decomposition of one document's score under a query.
Scores are produced by the SAME kernels the search path uses (same
float32 discipline), so ``explanation["value"] == hit score`` exactly —
the invariant CheckHits.verifyExplanation asserts.

Shapes:
- TermQuery — "weight(<field:term> in <doc>)" with idf / tf-saturation /
  norm details (BM25Similarity.explain's breakdown).
- BooleanQuery — "sum of:" over the matching scoring clauses, with FILTER
  clauses as value-0 "match on" details, MUST/minShouldMatch failures as
  non-matches ("failure to meet condition" descriptions).
- BoostQuery / ConstantScoreQuery / MatchAllDocsQuery — their wrappers.
- Everything else (phrases, spans, intervals, dismax, ...) falls back to
  a single-node explanation whose value comes from the generic evaluator
  — still exact, just not decomposed (the reference's default
  Weight.explain for exotic scorers is similarly shallow).
"""

from __future__ import annotations

import numpy as np

from . import queries as Q
from .scorers import _view, eval_query


def _no_match(description: str) -> dict:
    return {"match": False, "value": 0.0, "description": description, "details": []}


def _leaf_term(reader, q: Q.TermQuery, doc: int, stats, bm25) -> dict:
    fr = _view(reader, q.field)
    tp = fr.term_postings(q.term)
    if tp is None:
        return _no_match(f"no matching term {q.term!r}")
    docs, freqs = tp.decode()
    i = int(np.searchsorted(docs, doc))
    if i >= len(docs) or docs[i] != doc:
        return _no_match(f"no matching term {q.term!r}")
    freq = int(freqs[i])
    df = stats.df(q.term, q.field) if q.df_override < 0 else q.df_override
    ttf = stats.ttf(q.term, q.field) if q.ttf_override < 0 else q.ttf_override
    tw = bm25.term_weight(
        df, stats.n_docs(q.field), stats.sttf(q.field), q.boost, ttf=ttf
    )
    norm_byte = int(fr.norms[doc])
    value = float(tw.score_scalar(freq, norm_byte))
    field = q.field or "<primary>"
    return {
        "match": True,
        "value": value,
        "description": f"weight({field}:{q.term} in {doc}), result of:",
        "details": [
            {
                "match": True,
                "value": freq,
                "description": f"freq, occurrences of term within document",
                "details": [],
            },
            {
                "match": True,
                "value": df,
                "description": "n, number of documents containing term",
                "details": [],
            },
            {
                "match": True,
                "value": stats.n_docs(q.field),
                "description": "N, total number of documents with field",
                "details": [],
            },
            {
                "match": True,
                "value": norm_byte,
                "description": "norm byte (SmallFloat-encoded field length)",
                "details": [],
            },
        ],
    }


def _matches(reader, q: Q.Query, doc: int, stats, bm25) -> tuple[bool, float]:
    """(matched, score) via the generic evaluator — the fallback path."""
    docs, scores = eval_query(reader, q, stats, bm25)
    i = int(np.searchsorted(docs, doc))
    if i >= len(docs) or docs[i] != doc:
        return False, 0.0
    return True, float(scores[i])


def _explain_node(reader, q: Q.Query, doc: int, stats, bm25) -> dict:
    if isinstance(q, Q.TermQuery):
        return _leaf_term(reader, q, doc, stats, bm25)
    if isinstance(q, Q.MatchAllDocsQuery):
        return {
            "match": True,
            "value": float(np.float32(q.boost)),
            "description": "*:*",
            "details": [],
        }
    if isinstance(q, Q.MatchNoDocsQuery):
        return _no_match("MatchNoDocsQuery")
    if isinstance(q, Q.BoostQuery):
        sub = _explain_node(reader, q.query, doc, stats, bm25)
        if not sub["match"]:
            return sub
        return {
            "match": True,
            "value": float(np.float32(q.boost) * np.float32(sub["value"])),
            "description": f"boost({q.boost}) * sub, product of:",
            "details": [sub],
        }
    if isinstance(q, Q.ConstantScoreQuery):
        ok, _ = _matches(reader, q.query, doc, stats, bm25)
        if not ok:
            return _no_match("ConstantScore: wrapped query does not match")
        return {
            "match": True,
            "value": float(np.float32(q.boost)),
            "description": "ConstantScore, matched wrapped query",
            "details": [],
        }
    if isinstance(q, Q.BooleanQuery):
        details: list[dict] = []
        scoring: list[float] = []
        n_should_matched = 0
        n_should = 0
        for c in q.clauses:
            if c.occur == Q.MUST_NOT:
                ok, _ = _matches(reader, c.query, doc, stats, bm25)
                if ok:
                    return _no_match("excluded by MUST_NOT clause")
                continue
            if c.occur == Q.FILTER:
                ok, _ = _matches(reader, c.query, doc, stats, bm25)
                if not ok:
                    return _no_match("failure to match FILTER clause")
                details.append(
                    {
                        "match": True,
                        "value": 0.0,
                        "description": "match on required (filter) clause",
                        "details": [],
                    }
                )
                continue
            sub = _explain_node(reader, c.query, doc, stats, bm25)
            if c.occur == Q.MUST:
                if not sub["match"]:
                    return _no_match("failure to match MUST clause")
                details.append(sub)
                scoring.append(sub["value"])
            else:  # SHOULD
                n_should += 1
                if sub["match"]:
                    n_should_matched += 1
                    details.append(sub)
                    scoring.append(sub["value"])
        has_required = any(c.occur in (Q.MUST, Q.FILTER) for c in q.clauses)
        need = max(q.min_should_match, 0 if has_required else 1)
        if n_should and n_should_matched < need:
            return _no_match(
                f"failure to meet condition of minimumNumberShouldMatch "
                f"({n_should_matched} < {need})"
            )
        if not has_required and n_should == 0:
            return _no_match("no scoring clauses")
        value = float(np.float32(sum(np.float64(s) for s in scoring)))
        return {
            "match": True,
            "value": value,
            "description": "sum of:",
            "details": details,
        }
    # generic fallback: exact value, shallow tree
    ok, score = _matches(reader, q, doc, stats, bm25)
    if not ok:
        return _no_match(f"no match on {type(q).__name__}")
    return {
        "match": True,
        "value": score,
        "description": f"{type(q).__name__}, computed by the generic scorer",
        "details": [],
    }


def explain(searcher, query, doc: int) -> dict:
    """Explain ``doc``'s score under ``query`` against ``searcher`` —
    parse/rewrite/stat-gather exactly like search(), then decompose.
    ``doc`` is a GLOBAL docID."""
    q = searcher.parse(query) if isinstance(query, str) else query
    if Q.needs_rewrite(q):
        q = Q.rewrite(q, searcher.term_dict_union())
    stats = searcher.collection_stats(Q.collect_field_terms(q))
    if len(searcher.tombstones) and not searcher._live(
        np.asarray([doc], dtype=np.int64)
    )[0]:
        return _no_match(f"document {doc} is deleted")
    for r in searcher.readers:
        if r.doc_base <= doc < r.doc_base + r.doc_count:
            out = _explain_node(r, q, doc - r.doc_base, stats, searcher.bm25)
            return out
    return _no_match(f"document {doc} is out of range")
