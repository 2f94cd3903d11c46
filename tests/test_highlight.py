"""Highlighter tests: the vectorized highlight_batch duels a literal
transcription of FieldHighlighter.highlightOffsetsEnums (greedy passage
walk + bounded queue) on random corpora; formatter join semantics."""

from __future__ import annotations

import heapq
import math

import numpy as np
import pyarrow as pa

from lucene_7_x_9_x_ray.search.highlight import (
    B,
    K1,
    PIVOT,
    HighlightStage,
    format_doc,
    highlight_batch,
)


def _literal_highlight(text: str, terms: list[str], window: int, max_passages: int):
    """Literal FieldHighlighter.java:125-196 on one doc: match offsets in
    document order, passage = token-aligned window of the first match,
    min-heap keyed (score, startOffset), emit ascending startOffset."""
    toks = text.split(" ")
    starts, p = [], 0
    for t in toks:
        starts.append(p)
        p += len(t) + 1
    content_len = len(text)
    tset = set(terms)
    ttf: dict[str, int] = {}
    for t in toks:
        if t in tset:
            ttf[t] = ttf.get(t, 0) + 1
    matches = [(starts[i], toks[i]) for i in range(len(toks)) if toks[i] in tset]
    if not matches:
        return []

    def win_bounds(match_start: int):
        # break iterator: fixed windows of `window` tokens
        ti = max(0, np.searchsorted(starts, match_start, side="right") - 1)
        w = ti // window
        a, b = w * window, min((w + 1) * window, len(toks))
        return starts[a], starts[b - 1] + len(toks[b - 1])

    def score(passage_terms: dict[str, int], p_start: int, p_len: int) -> float:
        s = 0.0
        for term, freq in passage_terms.items():
            nd = 1.0 + content_len / PIVOT
            w = (K1 + 1.0) * math.log(1.0 + (nd + 0.5) / (ttf[term] + 0.5))
            norm = K1 * ((1.0 - B) + B * (p_len / PIVOT))
            s += freq / (freq + norm) * w
        return s * (1.0 + 1.0 / math.log(PIVOT + p_start))

    heap: list[tuple[float, int, int]] = []  # (score, start, end)

    def close(cur):
        if cur is None:
            return
        p_start, p_end, pterms = cur
        sc = score(pterms, p_start, p_end - p_start)
        item = (sc, p_start, p_end)
        if len(heap) == max_passages and item < heap[0]:
            return  # can't compete (score tie: smaller start loses)
        heapq.heappush(heap, item)
        if len(heap) > max_passages:
            heapq.heappop(heap)

    cur = None
    for mstart, term in matches:
        if cur is None or mstart >= cur[1]:
            close(cur)
            a, b = win_bounds(mstart)
            cur = (a, b, {})
        cur[2][term] = cur[2].get(term, 0) + 1
    close(cur)
    return sorted((start, sc) for sc, start, _e in heap)


def test_highlight_duels_literal_lucene_loop():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    terms = ["w0", "w3", "w7"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 120)))
        for _ in range(200)
    ]
    rows, ords, starts, scores, snips = highlight_batch(
        pa.array(texts), terms, window_tokens=8, max_passages=3
    )
    got: dict[int, list[tuple[int, float]]] = {}
    for r, st, sc in zip(rows, starts, scores):
        got.setdefault(r, []).append((st, sc))
    for i, text in enumerate(texts):
        want = _literal_highlight(text, terms, window=8, max_passages=3)
        have = got.get(i, [])
        assert len(have) == len(want), i
        for (hs, hsc), (ws, wsc) in zip(have, want):
            assert hs == ws, (i, have, want)
            assert abs(hsc - wsc) < 1e-9 * max(1.0, abs(wsc)), i


def test_highlight_snippet_wraps_only_matches():
    texts = pa.array(["alpha beta gamma beta", "nothing here"])
    rows, ords, starts, scores, snips = highlight_batch(
        texts, ["beta"], window_tokens=16, max_passages=2
    )
    assert rows == [0] and ords == [1] and starts == [0]
    assert snips == ["alpha <b>beta</b> gamma <b>beta</b>"]


def test_highlight_phrase_strict_participation():
    """Position-aware (strict) phrase highlighting: only tokens inside an
    exact adjacent occurrence match — a doc with both terms non-adjacent
    emits nothing; overlapping occurrences tag each token once."""
    texts = pa.array(
        [
            "alpha key hash beta",            # one occurrence
            "key beta hash",                  # both terms, NOT adjacent -> no match
            "key hash key hash gamma",        # two occurrences
            "hash key",                       # wrong order -> no match
        ]
    )
    rows, ords, starts, scores, snips = highlight_batch(
        texts, [], window_tokens=16, max_passages=2, phrases=[["key", "hash"]]
    )
    assert sorted(set(rows)) == [0, 2]
    by_row = dict(zip(rows, snips))
    assert by_row[0] == "alpha <b>key</b> <b>hash</b> beta"
    assert by_row[2] == "<b>key</b> <b>hash</b> <b>key</b> <b>hash</b> gamma"

    # loose + phrase mix: the loose term tags everywhere, the phrase only
    # where adjacent
    rows2, _, _, _, snips2 = highlight_batch(
        texts, ["beta"], window_tokens=16, max_passages=2,
        phrases=[["key", "hash"]],
    )
    by_row2 = dict(zip(rows2, snips2))
    assert by_row2[1] == "key <b>beta</b> hash"
    assert by_row2[0] == "alpha <b>key</b> <b>hash</b> <b>beta</b>"


def test_highlight_score_tie_keeps_later_passage():
    # two identical windows -> identical scores except the position norm;
    # force an exact tie by zero-width norm difference: same window content
    # at the same start is impossible, so instead pin the queue bound: with
    # max_passages=1 and three matching windows, the single best survives
    text = " ".join(["x"] * 8 + ["hit"] * 8 + ["x"] * 8 + ["hit"] * 2 + ["x"] * 6)
    rows, ords, starts, scores, snips = highlight_batch(
        pa.array([text]), ["hit"], window_tokens=8, max_passages=1
    )
    assert len(rows) == 1
    # the 8-hit window scores above the 2-hit window
    assert snips[0].count("<b>hit</b>") == 8


def test_format_doc_ellipsis_join():
    # contract: gap iff start > previous end
    assert format_doc(["a b", "c d"], [0, 3], [3, 3]) == "a bc d"
    assert format_doc(["a b", "c d"], [0, 4], [3, 3]) == "a b... c d"
    assert format_doc(["a b", "c d"], [0, 10], [3, 3]) == "a b... c d"


def test_highlight_stage_schema(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": pa.array(["join the merge", "no match doc"]),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(HighlightStage(["join", "merge"]), batch_format="pyarrow")
        .take_all()
    )
    assert [r["doc_id"] for r in out] == [7]
    assert out[0]["snippet"] == "<b>join</b> the <b>merge</b>"
