"""Segment build + reader round-trip and CheckIndex-style invariants
(FIXTURES.md F6; pattern of CheckIndex.java:642-882)."""

import os

import numpy as np
import pytest

from lucene_7_x_9_x_ray.functions.analysis import get_analyzer
from lucene_7_x_9_x_ray.functions.codec import block_bounds
from lucene_7_x_9_x_ray.state.segment import SegmentReader, invert_texts, write_segment
from lucene_7_x_9_x_ray.functions.smallfloat import int_to_byte4

TEXTS = [
    "apple banana apple",
    "banana cherry",
    "",
    "apple apple apple banana",
    "date",
    "cherry date elderberry date",
]


@pytest.fixture()
def seg(tmp_path):
    an = get_analyzer("standard")
    seg_dir = str(tmp_path / "segments" / "seg_000000")
    os.makedirs(str(tmp_path / "segments"), exist_ok=True)
    write_segment(
        out_dir=seg_dir,
        seg_name="seg_000000",
        texts=TEXTS,
        urls=[f"u{i}" for i in range(len(TEXTS))],
        warc_ts=np.arange(len(TEXTS)).astype("datetime64[us]"),
        langs=["en"] * len(TEXTS),
        analyzer=an,
        doc_base=100,
        lineage_file="mem",
    )
    return SegmentReader(seg_dir)


def test_invert_counts():
    an = get_analyzer("standard")
    terms, docs, freqs, lengths = invert_texts(TEXTS, an)
    assert list(lengths) == [3, 2, 0, 4, 1, 4]
    tl = {(t, int(d)): int(f) for t, d, f in zip(terms, docs, freqs)}
    assert tl[("apple", 0)] == 2
    assert tl[("apple", 3)] == 3
    assert tl[("date", 5)] == 2
    assert ("apple", 1) not in tl


def test_invert_chunk_boundaries():
    an = get_analyzer("standard")
    a = invert_texts(TEXTS * 100, an, chunk_rows=7)
    b = invert_texts(TEXTS * 100, an, chunk_rows=100_000)
    for x, y in zip(a, b):
        # same pair multiset regardless of chunking
        if x.dtype == object:
            assert sorted(x) == sorted(y)
        else:
            assert sorted(x.tolist()) == sorted(y.tolist())


def test_reader_term_stats(seg):
    assert seg.term_stats("apple") == (2, 5)
    assert seg.term_stats("banana") == (3, 3)
    assert seg.term_stats("date") == (2, 3)
    assert seg.term_stats("absent") == (0, 0)
    assert seg.doc_count == 6
    assert seg.doc_base == 100


def test_reader_postings_roundtrip(seg):
    tp = seg.term_postings("apple")
    docs, freqs = tp.decode()
    assert list(docs) == [0, 3]
    assert list(freqs) == [2, 3]
    tp2 = seg.term_postings("elderberry")
    d2, f2 = tp2.decode()
    assert list(d2) == [5] and list(f2) == [1]


def test_norms_match_lengths(seg):
    lengths = np.array([3, 2, 0, 4, 1, 4])
    assert np.array_equal(seg.norms, int_to_byte4(lengths))


def test_checkindex_invariants(seg):
    """The CheckIndex-analogue invariant pass (FIXTURES.md F6)."""
    # terms sorted strictly ascending
    assert all(seg.terms[i] < seg.terms[i + 1] for i in range(len(seg.terms) - 1))
    sum_df = 0
    sum_ttf = 0
    for i in range(len(seg.terms)):
        tp = seg.postings_by_ord(i)
        docs, freqs = tp.decode()
        # docIDs strictly ascending
        assert np.all(np.diff(docs) > 0) or len(docs) == 1
        # docFreq == len(postings), totalTermFreq == sum(freqs)
        assert tp.doc_freq == len(docs)
        assert tp.total_term_freq == freqs.sum()
        # freqs >= 1
        assert freqs.min() >= 1
        # block metadata consistent
        nblocks, counts = block_bounds(tp.doc_freq)
        assert len(tp.last_docs) == nblocks
        assert tp.last_docs[-1] == docs[-1]
        # impacts dominate every (freq, norm) in their block
        off = 0
        for bi, (bf, bn) in enumerate(tp.impact_slices()):
            s = int(counts[:bi].sum())
            c = int(counts[bi])
            bdocs, bfreqs = docs[s : s + c], freqs[s : s + c]
            bnorms = seg.norms[bdocs]
            for f, n in zip(bfreqs, bnorms):
                assert any(bf[j] >= f and bn[j] <= n for j in range(len(bf)))
        sum_df += tp.doc_freq
        sum_ttf += tp.total_term_freq
    # segment stats == recomputed sums
    assert seg.stats.sum_doc_freq == sum_df
    assert seg.stats.sum_total_term_freq == sum_ttf
    assert seg.stats.unique_terms == len(seg.terms)


def test_atomic_commit_no_partial_dir(tmp_path):
    # a segment dir either exists completely or not at all
    seg_dir = str(tmp_path / "segments" / "s0")
    os.makedirs(str(tmp_path / "segments"))
    an = get_analyzer("standard")
    write_segment(seg_dir, "s0", ["a b"], ["u"], np.array([0]).astype("datetime64[us]"),
                  ["en"], an, 0)
    names = set(os.listdir(seg_dir))
    assert {"terms.parquet", "postings.bin", "norms.bin", "docmap.parquet", "stats.json"} <= names
    # no stray tmp dirs left behind
    assert not [d for d in os.listdir(str(tmp_path / "segments")) if d.startswith(".")]
