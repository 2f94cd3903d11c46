"""Lucene misc-module analogues: HighFreqTerms and DocValuesStats.

- ``high_freq_terms`` re-creates org.apache.lucene.misc.HighFreqTerms
  (s84 misc/src/java/org/apache/lucene/misc/HighFreqTerms.java:47): the
  top-N terms of the index ordered by docFreq or totalTermFreq. Here it is
  one vectorized pass over the merged term dictionaries (the per-shard
  ``terms.parquet`` arrays are already in memory), grouped by term to fold
  the hot-term doc-bucket salting back into one stat per term — no
  per-term loop, no postings decode.

- ``doc_values_stats`` re-creates org.apache.lucene.misc.DocValuesStats
  (misc/.../DocValuesStats.java:28): count / missing / min / max / mean /
  population variance+stdev of a numeric doc-values column over LIVE docs,
  computed with numpy column kernels instead of the reference's per-doc
  Welford accumulator (same real-valued result; fp noise is orders of
  magnitude below the gate's rounding grid).
"""

from __future__ import annotations

import numpy as np


def high_freq_terms(
    searcher, n: int, order: str = "df"
) -> list[tuple[str, int, int]]:
    """Top-``n`` (term, doc_freq, total_term_freq) by ``order`` ("df" |
    "ttf") descending, ties broken by ascending term — the
    HighFreqTerms.getHighFreqTerms DocFreqComparator/TotalTermFreqComparator
    orderings."""
    if order not in ("df", "ttf"):
        raise ValueError(f"order must be 'df' or 'ttf', got {order!r}")
    tables = []  # (terms, dfs, ttfs) triples: one per dictionary shard
    for r in searcher.readers:
        if hasattr(r, "_shard_infos"):  # MergedReader: per-shard term tables
            for info in r._shard_infos:
                sh = r._shard(info["shard_id"])
                tables.append((sh.terms, sh.doc_freqs, sh.ttfs))
        else:  # SegmentReader: one term table
            tables.append((r.terms, r.doc_freqs, r.ttfs))
    terms = np.concatenate([t for t, _, _ in tables])
    dfs = np.concatenate([d for _, d, _ in tables]).astype(np.int64)
    ttfs = np.concatenate([t for _, _, t in tables]).astype(np.int64)
    # fold duplicate dictionary entries (hot-term salt buckets / unmerged
    # segments) into one stat per term: sort by term, segmented sum
    srt = np.argsort(terms, kind="stable")
    terms, dfs, ttfs = terms[srt], dfs[srt], ttfs[srt]
    starts = np.flatnonzero(np.r_[True, terms[1:] != terms[:-1]])
    terms = terms[starts]
    dfs = np.add.reduceat(dfs, starts)
    ttfs = np.add.reduceat(ttfs, starts)
    key = dfs if order == "df" else ttfs
    # descending key, ascending term: terms are already term-ascending, so
    # a stable sort on -key preserves the tie-break
    top = np.argsort(-key, kind="stable")[:n]
    return [(str(terms[i]), int(dfs[i]), int(ttfs[i])) for i in top]


def doc_values_stats(searcher, col: str) -> dict[str, float]:
    """DocValuesStats over a numeric doc-values column for all LIVE docs:
    {count, missing, min, max, mean, variance, stdev} (variance/stdev are
    population moments, matching NumericDocValuesStats.java's
    variance()/stdev()). Missing = live docs where the column has no value
    (the advanceExact-miss count)."""
    vals = np.concatenate(
        [np.asarray(r.doc_values(col), dtype=np.float64) for r in searcher.readers]
    )
    valid = np.concatenate([r.doc_values_valid(col) for r in searcher.readers])
    gdocs = np.arange(len(vals), dtype=np.int64)
    if len(searcher.tombstones):
        live = searcher._live(gdocs)
        vals, valid = vals[live], valid[live]
    present = vals[valid]
    n_total = len(vals)
    n = len(present)
    if n == 0:
        return {
            "count": 0.0, "missing": float(n_total), "min": float("nan"),
            "max": float("nan"), "mean": float("nan"),
            "variance": float("nan"), "stdev": float("nan"),
        }
    mean = float(np.mean(present))
    var = float(np.var(present))  # population variance, like variance()
    return {
        "count": float(n),
        "missing": float(n_total - n),
        "min": float(np.min(present)),
        "max": float(np.max(present)),
        "mean": mean,
        "variance": var,
        "stdev": float(np.sqrt(var)),
    }
