"""Cluster job entry point: serve a query file against a built index.

    ray job submit --working-dir . -- \
        python jobs/query_job.py --index-dir /shared/index \
            --queries queries.jsonl --k 10 --sharded

``--queries`` is JSONL: {"query_id": ..., "terms": [...], "k": 10} per
line (k optional). ``--sharded`` fans each query across doc-range segment
shards (LeafSlice model); default serves from the merged index actor pool.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--queries", required=True, help="JSONL query file")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--out", default="", help="optional parquet output path")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init()
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    specs = []
    with open(args.queries) as f:
        for line in f:
            if line.strip():
                row = json.loads(line)
                specs.append(
                    (row["query_id"], list(row["terms"]), int(row.get("k", args.k)))
                )

    from lucene_7_x_9_x_ray.stages.serve import serve_queries, serve_queries_sharded

    if args.sharded:
        table = serve_queries_sharded(
            args.index_dir, specs, concurrency=args.concurrency
        )
    else:
        table = serve_queries(args.index_dir, specs, concurrency=args.concurrency)
    if args.out:
        import pyarrow.parquet as pq

        pq.write_table(table, args.out)
    else:
        for row in table.to_pylist():
            print(json.dumps(row))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
