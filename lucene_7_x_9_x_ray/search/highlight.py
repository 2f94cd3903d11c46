"""UnifiedHighlighter-equivalent passage highlighting.

Behavioral reference (semantics recreated, representation redesigned):

- ``highlighter/src/java/org/apache/lucene/search/uhighlight/FieldHighlighter.java``
  (s84, highlightOffsetsEnums:125-176): walk term-match offsets in document
  order; each passage spans the break-iterator unit containing its first
  match; finished passages enter a bounded min-heap of ``max_passages``
  ordered by (score, startOffset) — equal scores evict the earlier passage
  (FieldHighlighter.java:134-143); survivors are emitted in startOffset
  order (:173-175).
- ``uhighlight/PassageScorer.java:83-142``: passage score =
  ``norm(start) * Σ_{unique terms} tf(freq_in_passage, passage_len) *
  weight(content_len, freq_in_doc)`` with
  ``weight(cl, ttf) = (k1+1) * ln(1 + (nd+0.5)/(ttf+0.5))``,
  ``nd = 1 + cl/pivot``,
  ``tf(f, pl) = f / (f + k1*((1-b) + b*pl/pivot))``,
  ``norm(s) = 1 + 1/ln(pivot + s)``; defaults k1=1.2, b=0.75, pivot=87.
- ``uhighlight/DefaultPassageFormatter.java:70-112``: passages join with
  "... " when non-contiguous; every match range wraps in <b>…</b>.

Deviations (documented):
- Break iterator: fixed windows of ``window_tokens`` whitespace tokens
  instead of the locale sentence iterator — the corpus has no sentence
  punctuation, and the reference itself ships pluggable iterators for
  exactly this (CustomSeparatorBreakIterator / LengthGoalBreakIterator /
  WholeBreakIterator). Windows are token-aligned, so the greedy
  passage-per-first-match loop reduces to "one passage per window that
  contains a match" with identical scoring inputs.
- Scores are float64 (numpy/DuckDB DOUBLE) rather than Java float32; gate
  outputs round to 4 decimals, far above either representation's noise.
- No HTML entity escaping in the formatter (tokens are already plain).

Scale shape: highlighting is a stateless per-row transform —
``ds.map_batches(HighlightStage(...), batch_format="pyarrow")`` streams
the corpus; all per-batch work is Arrow/numpy kernels over the exploded
token stream (split/flatten/is_in/reduceat), with Python touching only
the emitted passages (output-bounded, ``max_passages`` per doc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.2
B = 0.75
PIVOT = 87.0
DEFAULT_WINDOW_TOKENS = 16


def passage_weight(content_len: np.ndarray, ttf: np.ndarray) -> np.ndarray:
    """PassageScorer.weight (s84 PassageScorer.java:83-89)."""
    nd = 1.0 + content_len / PIVOT
    return (K1 + 1.0) * np.log(1.0 + (nd + 0.5) / (ttf + 0.5))


def passage_tf(freq: np.ndarray, passage_len: np.ndarray) -> np.ndarray:
    """PassageScorer.tf (s84 PassageScorer.java:92-100)."""
    norm = K1 * ((1.0 - B) + B * (passage_len / PIVOT))
    return freq / (freq + norm)


def passage_norm(start: np.ndarray) -> np.ndarray:
    """PassageScorer.norm (s84 PassageScorer.java:114-116)."""
    return 1.0 + 1.0 / np.log(PIVOT + start)


def highlight_batch(
    texts: pa.Array,
    terms: list[str],
    window_tokens: int = DEFAULT_WINDOW_TOKENS,
    max_passages: int = 2,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
    phrases: list[list[str]] | None = None,
):
    """Highlight one Arrow batch of texts against ``terms`` and exact
    ``phrases``.

    Phrase handling is position-aware (strict), the PhraseHelper model
    (s84 uhighlight/PhraseHelper.java:63 — by default the UH highlights
    phrases strictly, filtering each phrase term's OffsetsEnum to
    positions that participate in an actual phrase occurrence): a token
    counts as a match — for tagging AND for the passage/doc term
    frequencies fed to PassageScorer — only if it sits inside an exact
    adjacent occurrence of one of ``phrases`` (or equals a loose term).
    Occurrence detection is vectorized: shifted equality masks over the
    flat token stream ANDed with a same-doc guard.

    Returns parallel Python lists (row_idx, ord, p_start, score, snippet):
    one entry per selected passage; rows with no match emit nothing. ``ord``
    is the 1-based start-order position among a doc's selected passages
    (the formatter's emission order, FieldHighlighter.java:173-175).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    phrases = phrases or []
    if n == 0 or (not terms and not phrases):
        return [], [], [], [], []
    toks = pc.split_pattern(texts, pattern=" ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy()
    doc_start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(pc.list_value_length(toks).to_numpy(zero_copy_only=False), out=doc_start[1:])
    tlen = pc.utf8_length(flat).to_numpy()
    # char start of each token within its doc: global cumsum of (len+1)
    # rebased at each doc head
    gcum = np.zeros(len(tlen) + 1, dtype=np.int64)
    np.cumsum(tlen + 1, out=gcum[1:])
    cstart = gcum[:-1] - gcum[doc_start[parents]] if len(tlen) else gcum[:0]
    pos = np.arange(len(tlen), dtype=np.int64) - doc_start[parents]
    win = pos // window_tokens
    content_len = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)

    # combined vocabulary: loose terms + phrase terms; a token is a match
    # if its term is loose, or it participates in a phrase occurrence
    vocab = list(dict.fromkeys(list(terms) + [t for ph in phrases for t in ph]))
    loose = np.array([v in set(terms) for v in vocab], dtype=bool)
    tset = pa.array(vocab, type=flat.type if not pa.types.is_large_string(flat.type) else pa.large_string())
    tidx = pc.index_in(flat, value_set=tset).to_numpy(zero_copy_only=False)
    valid = ~np.isnan(tidx) if tidx.dtype.kind == "f" else tidx >= 0
    tidx = np.where(valid, tidx, 0).astype(np.int64)
    is_match = valid & loose[tidx]
    nf = len(tidx)
    for ph in phrases:
        ids = [vocab.index(t) for t in ph]
        L = len(ids)
        if nf < L:
            continue
        occ = valid & (tidx == ids[0])
        for j in range(1, L):
            nxt = np.zeros(nf, dtype=bool)
            nxt[: nf - j] = valid[j:] & (tidx[j:] == ids[j])
            occ &= nxt
        samedoc = np.zeros(nf, dtype=bool)
        samedoc[: nf - L + 1] = parents[: nf - L + 1] == parents[L - 1 :]
        occ &= samedoc
        starts_ = np.flatnonzero(occ)
        for j in range(L):  # L is tiny (phrase length); unions overlap-safe
            is_match[starts_ + j] = True
    m = np.flatnonzero(is_match)
    if len(m) == 0:
        return [], [], [], [], []

    T = len(vocab)
    # per-(doc, term) freq in doc (OffsetsEnum.freq -> termFreqsInDoc)
    ttf = np.zeros((n, T), dtype=np.int64)
    np.add.at(ttf, (parents[m], tidx[m]), 1)

    # per-(doc, win, term) freq in passage over the sparse match stream
    key = (parents[m] * (win.max() + 1) + win[m]) * T + tidx[m]
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    uk = ks[starts]
    freq = np.diff(np.r_[starts, len(ks)])
    u_doc = uk // (T * (win.max() + 1))
    u_win = (uk // T) % (win.max() + 1)
    u_term = uk % T

    # passage geometry per (doc, win): token-aligned window bounds
    first_tok = doc_start[u_doc] + u_win * window_tokens
    last_tok = np.minimum(
        doc_start[u_doc] + (u_win + 1) * window_tokens, doc_start[u_doc + 1]
    ) - 1
    p_start = cstart[first_tok].astype(np.float64)
    p_len = (cstart[last_tok] + tlen[last_tok] - cstart[first_tok]).astype(np.float64)

    contrib = passage_tf(freq.astype(np.float64), p_len) * passage_weight(
        content_len[u_doc], ttf[u_doc, u_term].astype(np.float64)
    )
    # collapse the per-term contributions to per-passage scores
    pkey = u_doc * (win.max() + 1) + u_win
    pb = np.flatnonzero(np.r_[True, pkey[1:] != pkey[:-1]])
    score = np.add.reduceat(contrib, pb) * passage_norm(p_start[pb])
    pg_doc = u_doc[pb]
    pg_win = u_win[pb]
    pg_start = p_start[pb].astype(np.int64)
    pg_first = first_tok[pb]
    pg_last = last_tok[pb]

    # bounded min-heap by (score, startOffset): keep top max_passages,
    # equal scores keep the LATER passage (FieldHighlighter.java:134-143)
    sel = np.lexsort((-pg_start, -score, pg_doc))
    run = np.flatnonzero(np.r_[True, pg_doc[sel][1:] != pg_doc[sel][:-1]])
    rank_in_doc = np.arange(len(sel)) - np.repeat(run, np.diff(np.r_[run, len(sel)]))
    sel = sel[rank_in_doc < max_passages]
    # emit in startOffset order within each doc (formatter order)
    emit = sel[np.lexsort((pg_start[sel], pg_doc[sel]))]
    erun = np.flatnonzero(np.r_[True, pg_doc[emit][1:] != pg_doc[emit][:-1]])
    ords = (np.arange(len(emit)) - np.repeat(erun, np.diff(np.r_[erun, len(emit)])) + 1)

    toks_py = flat.to_pylist()
    rows, out_ord, out_start, out_score, out_snip = [], [], [], [], []
    for j, e in enumerate(emit):
        a, b = int(pg_first[e]), int(pg_last[e]) + 1
        words = [
            pre_tag + w + post_tag if is_match[t] else w
            for t, w in zip(range(a, b), toks_py[a:b])
        ]
        rows.append(int(pg_doc[e]))
        out_ord.append(int(ords[j]))
        out_start.append(int(pg_start[e]))
        out_score.append(float(score[e]))
        out_snip.append(" ".join(words))
    return rows, out_ord, out_start, out_score, out_snip


def format_doc(snippets: list[str], starts: list[int], lens: list[int]) -> str:
    """DefaultPassageFormatter.format (s84 :70-112): join selected passages,
    inserting "... " between non-contiguous ones."""
    out = []
    pos = 0
    for s, start, ln in zip(snippets, starts, lens):
        if start > pos:
            out.append("... ")
        out.append(s)
        pos = start + ln
    return "".join(out)


class HighlightStage:
    """``map_batches`` stage: documents (doc_id, text) -> one row per
    selected passage (doc_id, ord, p_start, score, snippet). Stateless;
    the compiled term list rides the task closure (tiny)."""

    def __init__(
        self,
        terms: list[str],
        window_tokens: int = DEFAULT_WINDOW_TOKENS,
        max_passages: int = 2,
        phrases: list[list[str]] | None = None,
    ):
        self.terms = list(terms)
        self.window_tokens = window_tokens
        self.max_passages = max_passages
        self.phrases = [list(p) for p in (phrases or [])]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows, ords, starts, scores, snips = highlight_batch(
            batch["text"],
            self.terms,
            window_tokens=self.window_tokens,
            max_passages=self.max_passages,
            phrases=self.phrases,
        )
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array([int(doc_ids[r]) for r in rows], pa.int64()),
                "ord": pa.array(ords, pa.int64()),
                "p_start": pa.array(starts, pa.int64()),
                "score": pa.array(scores, pa.float64()),
                "snippet": pa.array(snips, pa.string()),
            }
        )
