"""misc-module analogues: HighFreqTerms and DocValuesStats
(s84 misc/src/java/org/apache/lucene/misc/)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_7_x_9_x_ray.search.misc import doc_values_stats, high_freq_terms
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local
from lucene_7_x_9_x_ray.state.livedocs import delete_docs


def _build(tmp_path, texts, hints=None, segment_size=None):
    n = len(texts)
    cols = {
        "url": [f"u{i}" for i in range(n)],
        "warc_ts": pa.array(range(n), pa.timestamp("us")),
        "text": texts,
        "lang": ["en"] * n,
    }
    store = ()
    if hints is not None:
        cols["hint"] = pa.array(hints, pa.float64())
        store = ("hint",)
    path = str(tmp_path / "p.parquet")
    pq.write_table(pa.table(cols), path)
    idx = str(tmp_path / "i")
    build_index_local(
        [path], idx,
        BuildConfig(target_docs_per_segment=segment_size or max(2, n // 3),
                    store_cols=store),
    )
    return idx


def test_high_freq_terms_orders_and_folds_segments(tmp_path):
    """Top-N by df and by ttf match brute-force counts; per-segment
    dictionary entries fold into one stat per term; ties break by term."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i:02d}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 40)))
        for _ in range(120)
    ]
    idx = _build(tmp_path, texts)  # multiple segments
    s = IndexSearcher(idx)

    df = Counter()
    ttf = Counter()
    for t in texts:
        toks = t.split()
        ttf.update(toks)
        df.update(set(toks))

    got_df = high_freq_terms(s, 8, "df")
    want_df = sorted(df, key=lambda t: (-df[t], t))[:8]
    assert [t for t, _, _ in got_df] == want_df
    assert all(d == df[t] and f == ttf[t] for t, d, f in got_df)

    got_ttf = high_freq_terms(s, 8, "ttf")
    want_ttf = sorted(ttf, key=lambda t: (-ttf[t], t))[:8]
    assert [t for t, _, _ in got_ttf] == want_ttf


def test_doc_values_stats_missing_and_deletes(tmp_path):
    """count/missing/min/max/mean/variance over present values of LIVE
    docs; population moments; deletes drop rows from the stats."""
    n = 60
    hints = [None if i % 4 == 0 else float(i * 3 % 17) for i in range(n)]
    idx = _build(tmp_path, ["doc text here"] * n, hints=hints)
    s = IndexSearcher(idx)

    present = np.array([h for h in hints if h is not None])
    st = doc_values_stats(s, "hint")
    assert st["count"] == len(present)
    assert st["missing"] == n - len(present)
    assert st["min"] == present.min() and st["max"] == present.max()
    assert abs(st["mean"] - present.mean()) < 1e-12
    assert abs(st["variance"] - present.var()) < 1e-12
    assert abs(st["stdev"] - np.sqrt(present.var())) < 1e-12

    # delete the first 10 docs: stats recompute over live rows only
    delete_docs(idx, list(range(10)))
    s2 = IndexSearcher(idx)
    live = [h for i, h in enumerate(hints) if i >= 10]
    present2 = np.array([h for h in live if h is not None])
    st2 = doc_values_stats(s2, "hint")
    assert st2["count"] == len(present2)
    assert st2["missing"] == len(live) - len(present2)
    assert abs(st2["mean"] - present2.mean()) < 1e-12
