"""Payload scoring (the queries/payloads module).

Behavioral references (semantics recreated, representation redesigned):

- ``queries/src/java/org/apache/lucene/queries/payloads/PayloadScoreQuery.java``
  (s84 :198-276): every matching span position contributes one payload
  factor — ``collectLeaf`` computes the decoder factor (1 when the payload
  is absent/null) and counts it in ``payloadsSeen`` unconditionally, then
  ``PayloadFunction.docScore`` combines; negative doc scores clamp to 0.
- ``MinPayloadFunction / MaxPayloadFunction / SumPayloadFunction /
  AveragePayloadFunction.java``: min / max / float-sum / sum-over-seen;
  all return 1 when no positions were seen.
- ``PayloadDecoder.java:83`` FLOAT_DECODER contract (upstream form:
  ``bytes == null ? 1 : PayloadHelper.decodeFloat(...)``): our .pay stream
  stores the decoded float32 directly (NaN = null payload -> factor 1).
- include_span_score (s84 PayloadScoreQuery.java:268-273): final score =
  span score * payload score. The wrapped span here is a single-term span
  (SpanTermQuery); its sloppy freq accumulates 1/(1+width) with
  TermSpans.width() == 0 (s84 spans/TermSpans.java:110, SpanScorer.java:118)
  so the span score is exactly the BM25 term score at freq = tf.

Scale shape: evaluates per segment like TermQuery — one postings +
positions + payloads decode, then segmented numpy reductions over the
per-doc position runs (no per-position Python); serves from the single
searcher, the merged searcher and the sharded pool via eval_query.
"""

from __future__ import annotations

import numpy as np

PAYLOAD_FUNCS = ("min", "max", "sum", "average")


def payload_doc_scores(
    pays: np.ndarray, freqs: np.ndarray, func: str
) -> np.ndarray:
    """Combine the per-position float32 payload factors into one float32
    score per doc. ``pays`` is the term's full payload stream (NaN = no
    payload -> factor 1.0), ``freqs`` the per-doc position counts whose
    cumulative sums delimit the per-doc runs."""
    if func not in PAYLOAD_FUNCS:
        raise ValueError(f"unknown payload function {func!r} (want {PAYLOAD_FUNCS})")
    factors = np.where(np.isnan(pays), np.float32(1.0), pays).astype(np.float32, copy=False)
    starts = np.zeros(len(freqs), dtype=np.int64)
    np.cumsum(freqs[:-1], out=starts[1:])
    if func == "min":
        out = np.minimum.reduceat(factors, starts)
    elif func == "max":
        out = np.maximum.reduceat(factors, starts)
    else:
        # float32 sequential accumulation, like the currentScore loop
        sums = np.add.reduceat(factors, starts).astype(np.float32, copy=False)
        if func == "average":
            out = sums / freqs.astype(np.float32)
        else:
            out = sums
    out = out.astype(np.float32, copy=False)
    # docScore: "if (score >= 0 == false) return 0" (negative -> 0; our
    # matched docs always have payloadsSeen = freq > 0, so the seen==0 -> 1
    # branch never applies here)
    return np.where(out >= 0, out, np.float32(0.0))


def eval_payload_query(reader, query, stats, bm25):
    """PayloadScoreQuery over one segment. Returns (local docIDs ascending,
    float32 scores)."""
    from .scorers import _empty, _view

    fr = _view(reader, query.field)
    if not getattr(fr, "has_payloads", False):
        raise ValueError(
            "PayloadScoreQuery requires an index built with payload_delimiter"
        )
    tppp = fr.term_positions_payloads(query.term)
    if tppp is None:
        return _empty()
    docs, freqs, _pos, pays = tppp
    if len(docs) == 0:
        return _empty()
    scores = payload_doc_scores(pays, freqs, query.func)
    if query.include_span_score:
        tw = bm25.term_weight(
            stats.df(query.term, query.field),
            stats.n_docs(query.field),
            stats.sttf(query.field),
            query.boost,
            ttf=stats.ttf(query.term, query.field),
        )
        span = tw.score(freqs, fr.norms[docs]).astype(np.float32, copy=False)
        scores = (span * scores).astype(np.float32, copy=False)
    # payload-only path: boost is not applied, matching the reference
    # (PayloadSpanScorer.scoreCurrentDoc returns getPayloadScore() alone,
    # which never consults the weight's boost)
    return docs, scores


def eval_span_payload_check(reader, query, stats, bm25):
    """SpanPayloadCheckQuery over one segment: positions whose float32
    payload equals ``query.payload`` exactly (byte-equality analogue;
    NaN/no-payload positions never match) survive; freq = surviving count
    per doc (TermSpans width 0); score = the term's BM25 weight at that
    freq — full term statistics, filtering never changes the idf
    (SpanPayloadCheckQuery.java:53 + SpanScorer sloppy freq)."""
    from .scorers import _empty, _view

    fr = _view(reader, query.field)
    if not getattr(fr, "has_payloads", False):
        raise ValueError(
            "SpanPayloadCheckQuery requires an index built with payload_delimiter"
        )
    tppp = fr.term_positions_payloads(query.term)
    if tppp is None:
        return _empty()
    docs, freqs, _pos, pays = tppp
    if len(docs) == 0:
        return _empty()
    starts = np.zeros(len(freqs), dtype=np.int64)
    np.cumsum(freqs[:-1], out=starts[1:])
    hit = (pays == np.float32(query.payload)).astype(np.int64)
    matched = np.add.reduceat(hit, starts)
    keep = matched > 0
    docs, matched = docs[keep], matched[keep]
    if len(docs) == 0:
        return _empty()
    tw = bm25.term_weight(
        stats.df(query.term, query.field),
        stats.n_docs(query.field),
        stats.sttf(query.field),
        query.boost,
        ttf=stats.ttf(query.term, query.field),
    )
    scores = tw.score(matched, fr.norms[docs]).astype(np.float32, copy=False)
    return docs, scores
