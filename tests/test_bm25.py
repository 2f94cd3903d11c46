"""BM25 kernel: pinned scores + float32 faithfulness (FIXTURES.md F4).

Pinned values computed from the reference formulas
(solr-8.4.0/lucene/core/.../similarities/BM25Similarity.java:67-264):
idf = (float) log(1 + (N - n + 0.5)/(n + 0.5));
cache[i] = 1f/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl));
score = weight - weight/(1 + freq*normInverse).
Parameter validation mirrors TestBM25Similarity.testIllegalK1/testIllegalB.
"""

import math

import numpy as np
import pytest

from lucene_7_x_9_x_ray.functions.bm25 import BM25, LENGTH_TABLE
from lucene_7_x_9_x_ray.functions.smallfloat import int_to_byte4


def test_illegal_params():
    with pytest.raises(ValueError):
        BM25(k1=-1)
    with pytest.raises(ValueError):
        BM25(k1=float("inf"))
    with pytest.raises(ValueError):
        BM25(b=-0.1)
    with pytest.raises(ValueError):
        BM25(b=1.5)
    with pytest.raises(ValueError):
        BM25(b=float("nan"))
    BM25(k1=0, b=0)
    BM25(k1=1.2, b=1.0)


def test_idf_formula():
    got = BM25.idf(doc_freq=3, doc_count=10)
    expect = np.float32(math.log(1 + (10 - 3 + 0.5) / (3 + 0.5)))
    assert got == expect
    # absent term still finite
    assert BM25.idf(0, 10) == np.float32(math.log(1 + 10.5 / 0.5))


def test_length_table_is_byte4_decode():
    assert LENGTH_TABLE[0] == 0.0
    assert LENGTH_TABLE[10] == 10.0  # free values exact
    assert np.all(np.diff(LENGTH_TABLE) > 0)


def test_score_float32_op_order():
    bm = BM25()
    N, df, sttf = 100, 10, 5000  # avgdl = 50
    tw = bm.term_weight(df, N, sttf)
    norm_byte = int(int_to_byte4(np.array([40]))[0])
    freq = 3
    # scalar float32 replication of the exact expression order
    avgdl = np.float32(np.float64(sttf) / np.float64(N))
    dl = np.float32(LENGTH_TABLE[norm_byte])
    one, k1, b = np.float32(1), np.float32(1.2), np.float32(0.75)
    norm_inv = one / (k1 * ((one - b) + b * dl / avgdl))
    weight = np.float32(1.0) * BM25.idf(df, N)
    expect = weight - weight / (one + np.float32(freq) * norm_inv)
    got = tw.score_scalar(freq, norm_byte)
    assert np.float32(got) == expect


def test_score_monotone_in_freq_and_length():
    bm = BM25()
    tw = bm.term_weight(5, 1000, 200_000)
    freqs = np.arange(1, 50, dtype=np.int64)
    norm = np.full(len(freqs), 30, dtype=np.uint8)
    s = tw.score(freqs, norm)
    assert np.all(np.diff(s) > 0)  # more freq -> higher score
    # longer doc (higher norm byte) -> lower score at fixed freq
    norms = np.arange(1, 255, dtype=np.uint8)
    s2 = tw.score(np.full(len(norms), 3), norms)
    assert np.all(np.diff(s2) <= 0)


def test_boost_scales_weight():
    bm = BM25()
    t1 = bm.term_weight(5, 100, 5000, boost=1.0)
    t2 = bm.term_weight(5, 100, 5000, boost=2.0)
    assert t2.weight == np.float32(2.0) * t1.weight


def test_max_score_over_impacts():
    bm = BM25()
    tw = bm.term_weight(5, 100, 5000)
    imp_f = np.array([1, 3, 7], dtype=np.int32)
    imp_n = np.array([5, 10, 20], dtype=np.uint8)
    ms = tw.max_score(imp_f, imp_n)
    all_scores = tw.score(imp_f, imp_n)
    assert ms == all_scores.max()
    assert tw.max_score(np.array([]), np.array([])) == 0.0


def test_k1_zero_degenerates_to_idf_weight():
    bm = BM25(k1=0, b=0)
    tw = bm.term_weight(5, 100, 5000)
    # k1=0 -> normInverse = inf -> score saturates to weight
    s = tw.score(np.array([1, 10]), np.array([20, 20], dtype=np.uint8))
    assert np.allclose(s, tw.weight)


def test_similarity_registry():
    """get_similarity: the pluggable-Similarity hook; parameterized BM25
    flows through the searcher and changes scores as k1/b dictate."""
    import pytest

    from lucene_7_x_9_x_ray.functions.bm25 import BM25, get_similarity

    assert get_similarity().k1 == np.float32(1.2)
    sim = get_similarity("bm25(k1=1.5, b=0.6)")
    assert sim.k1 == np.float32(1.5) and sim.b == np.float32(0.6)
    with pytest.raises(ValueError):
        get_similarity("tfidf")
    with pytest.raises(ValueError):
        get_similarity("bm25(z=1)")
    # b=0 removes length normalization: scores equal for same tf
    flat = get_similarity("bm25(k1=1.2, b=0)")
    tw = flat.term_weight(5, 100, 5000)
    s_short = tw.score(np.array([2]), np.array([10]))[0]
    s_long = tw.score(np.array([2]), np.array([200]))[0]
    assert s_short == s_long
    # default b: longer doc scores lower at equal tf
    tw2 = BM25().term_weight(5, 100, 5000)
    assert tw2.score(np.array([2]), np.array([10]))[0] > tw2.score(np.array([2]), np.array([200]))[0]
