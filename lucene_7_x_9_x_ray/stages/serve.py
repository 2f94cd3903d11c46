"""Query serving: a stateful actor pool over the memory-mapped index.

The IndexSearcher + reader-pool analogue (SURVEY.md §2.3, §4 "search
parallelism"): queries stream through ``map_batches(QueryScorer,
concurrency=N)`` where each actor opens the merged index ONCE in
``__init__`` (term dicts in RAM, postings/norms memory-mapped — the
MMapDirectory.java:95 equivalent) and scores query batches in
``__call__``.

Scale path: at 10^12 docs each actor holds one doc-range shard of the
merged index and every query fans out to all shards; per-shard top-k
reduce via topk.merge_topk (CollectorManager.reduce, searcher.py). In
this sandbox the whole index fits one shard, so the pool partitions the
query stream instead — same stage shape, same actor signature.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..search import queries as Q
from ..search.merged import open_searcher


class QueryScorer:
    """map_batches actor: load-once searcher, per-batch top-k scoring."""

    def __init__(self, index_dir: str, mode: str = "auto"):
        self.searcher = open_searcher(index_dir, prefer_merged=True)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for row in batch.to_pylist():
            query = Q.BooleanQuery.build(
                [(Q.SHOULD, Q.TermQuery(t)) for t in row["terms"]]
            )
            td = self.searcher.search(query, k=int(row["k"]), mode=self.mode)
            for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), start=1):
                qids.append(row["query_id"])
                ranks.append(r)
                docs.append(int(d))
                scores.append(float(s))
        return pa.table(
            {
                "query_id": pa.array(qids, pa.string()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def serve_queries(
    index_dir: str,
    query_specs: list[tuple[str, list[str], int]],
    concurrency: int = 2,
    mode: str = "auto",
) -> pa.Table:
    """Run (query_id, terms, k) specs through the scoring actor pool."""
    import ray
    import ray.data as rd

    items = [
        {"query_id": qid, "terms": terms, "k": k} for qid, terms, k in query_specs
    ]
    ds = rd.from_items(items, override_num_blocks=max(len(items), 1)).map_batches(
        QueryScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "mode": mode},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=concurrency,
    )
    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table(
            {
                "query_id": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    return pa.concat_tables(parts)
