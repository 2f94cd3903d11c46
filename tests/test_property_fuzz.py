"""Property-based fuzzing (hypothesis) of the byte-level kernels — the
RandomPostingsTester / BasePostingsFormatTestCase analogue (SURVEY.md §5.3):
random posting corpora round-trip through every codec path."""

from __future__ import annotations

import hypothesis.strategies as st
import numpy as np
from hypothesis import given, settings

from lucene_7_x_9_x_ray.functions import codec
from lucene_7_x_9_x_ray.functions.analysis import get_analyzer
from lucene_7_x_9_x_ray.functions.smallfloat import BYTE4_DECODE_TABLE, int_to_byte4


@st.composite
def posting_list(draw):
    doc_count = draw(st.integers(min_value=1, max_value=1500))
    df = draw(st.integers(min_value=1, max_value=min(doc_count, 600)))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    docs = np.sort(rng.choice(doc_count, size=df, replace=False)).astype(np.int64)
    freqs = rng.integers(1, draw(st.integers(2, 300)), size=df).astype(np.int64)
    norms = rng.integers(0, 256, size=doc_count).astype(np.uint8)
    return docs, freqs, norms


@given(posting_list())
@settings(max_examples=60, deadline=None)
def test_postings_roundtrip_fuzz(pl):
    docs, freqs, norms = pl
    enc = codec.encode_postings(docs, freqs, norms[docs])
    nblocks, counts = codec.block_bounds(len(docs))
    got_docs = codec.decode_docs(
        enc.docs_blob, np.frombuffer(enc.doc_widths, dtype=np.uint8), len(docs)
    )
    got_freqs = codec.decode_freqs(
        enc.freqs_blob, np.frombuffer(enc.freq_widths, dtype=np.uint8), len(docs)
    )
    assert np.array_equal(got_docs, docs)
    assert np.array_equal(got_freqs, freqs)
    # per-block decode agrees with bulk decode
    last = np.frombuffer(enc.last_docs, dtype=np.int64)
    for bi in range(nblocks):
        base = -1 if bi == 0 else int(last[bi - 1])
        d = codec.decode_docs(
            enc.docs_blob, np.frombuffer(enc.doc_widths, dtype=np.uint8),
            len(docs), bi, bi + 1, base,
        )
        s = bi * codec.BLOCK_SIZE
        assert np.array_equal(d, docs[s : s + int(counts[bi])])


@given(posting_list(), st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_segment_encoder_matches_per_term_fuzz(pl, seed):
    """encode_segment_terms over a random multi-term layout == per-term
    encode_postings/encode_positions, byte for byte."""
    docs, freqs, norms = pl
    rng = np.random.default_rng(seed)
    # split the posting list into 1..5 'terms'
    n_terms = int(rng.integers(1, 6))
    cuts = np.sort(rng.choice(np.arange(1, len(docs)), size=min(n_terms - 1, len(docs) - 1),
                              replace=False)) if len(docs) > 1 and n_terms > 1 else np.array([], int)
    starts = np.r_[0, cuts]
    ends = np.r_[cuts, len(docs)]
    # positions per occurrence
    pos_parts = [np.sort(rng.choice(5000, size=int(f), replace=False)) for f in freqs]
    pos_stream = np.concatenate(pos_parts).astype(np.int64)
    # each "term" must have strictly increasing docs — they do (global sort)
    enc = codec.encode_segment_terms(docs, freqs, norms[docs], starts, ends, pos_stream)
    p_off = 0
    for ti, (s, e) in enumerate(zip(starts, ends)):
        from lucene_7_x_9_x_ray.state.segment import _region_blobs

        want, wnb, wni = _region_blobs(codec.encode_postings(docs[s:e], freqs[s:e], norms[docs[s:e]]))
        got, nb, ni, _ld, _lf = enc.term_region(ti)
        assert got == want and (nb, ni) == (wnb, wni)
        ttf = int(freqs[s:e].sum())
        stream_t = pos_stream[p_off : p_off + ttf]
        p_off += ttf
        wb, ww = codec.encode_positions(stream_t, freqs[s:e])
        gb, gw, _ = enc.term_positions_blob(ti)
        assert gb == wb and gw == ww


@given(st.lists(st.text(max_size=60), max_size=8))
@settings(max_examples=80, deadline=None)
def test_analyzer_batch_consistency_fuzz(texts):
    """Batch tokenization == per-document tokenization for arbitrary
    unicode input (no cross-document contamination), and doc_idx is
    consistent with per-doc counts."""
    an = get_analyzer("standard")
    toks, doc_idx = an.tokenize_batch(texts)
    per_doc = [an.tokens(t) for t in texts]
    flat = [x for p in per_doc for x in p]
    assert list(toks) == flat
    counts = np.bincount(doc_idx, minlength=len(texts)) if len(toks) else np.zeros(len(texts))
    assert [int(c) for c in counts] == [len(p) for p in per_doc]


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_smallfloat_quantization_fuzz(length):
    """byte4ToInt(intToByte4(x)) is the largest table value <= x (the
    floor-quantization contract the SQL oracles rely on)."""
    b = int(int_to_byte4(np.array([length]))[0])
    decoded = int(BYTE4_DECODE_TABLE[b])
    assert decoded <= length
    larger = BYTE4_DECODE_TABLE[BYTE4_DECODE_TABLE > decoded]
    if len(larger):
        assert larger.min() > length or larger.min() > decoded
        # no table value in (decoded, length]
        assert not ((BYTE4_DECODE_TABLE > decoded) & (BYTE4_DECODE_TABLE <= length)).any()
