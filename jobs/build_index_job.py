"""Cluster job entry point: full index build + merge + validation.

Submit to a fixed-size Ray cluster (the north-rule launch path):

    ray job submit --working-dir . -- \
        python jobs/build_index_job.py \
            --input '/data/pages/*.parquet' --index-dir /shared/index \
            --docs-per-segment 100000 --n-shards 512

In this sandbox the same script runs standalone (Ray auto-inits local).
The build is resumable: re-submitting after a failure skips partitions
whose segment checkpoint (stats.json lineage record) already exists, and
the merge skips completed shards of the same segment-set fingerprint.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet glob of page files")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--docs-per-segment", type=int, default=100_000)
    ap.add_argument("--n-shards", type=int, default=32)
    ap.add_argument("--hot-df-threshold", type=int, default=1_000_000)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--verify-extract", action="store_true",
                    help="assert html->text byte-identity per row")
    ap.add_argument("--skip-merge", action="store_true")
    ap.add_argument("--checkindex", action="store_true",
                    help="run the CheckIndex-style validator afterwards")
    ap.add_argument("--compact", action="store_true",
                    help="run one tiered-compaction round before the merge")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime sets RAY_ADDRESS to the cluster;
        # standalone, the preset RAY_ADDRESS=local gives a local session
        ray.init()
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index
    from lucene_7_x_9_x_ray.stages.merge import MergeConfig, merge_index

    paths = sorted(glob.glob(args.input))
    if not paths:
        raise SystemExit(f"no input files match {args.input}")

    t0 = time.perf_counter()
    cfg = BuildConfig(
        verify_extract=args.verify_extract,
        index_positions=not args.no_positions,
        target_docs_per_segment=args.docs_per_segment,
    )
    manifest = build_index(paths, args.index_dir, cfg)
    build_sec = time.perf_counter() - t0

    if args.compact:
        from lucene_7_x_9_x_ray.stages.compact import compact_index

        manifest = compact_index(args.index_dir)

    merge_sec = 0.0
    if not args.skip_merge:
        t0 = time.perf_counter()
        merge_index(
            args.index_dir,
            MergeConfig(n_shards=args.n_shards, hot_df_threshold=args.hot_df_threshold),
        )
        merge_sec = time.perf_counter() - t0

    summary = {
        "doc_count": manifest.doc_count,
        "segments": len(manifest.segments),
        "resumed_segments": sum(1 for s in manifest.segments if s.get("resumed")),
        "build_sec": round(build_sec, 3),
        "merge_sec": round(merge_sec, 3),
        "docs_per_sec": round(manifest.doc_count / max(build_sec + merge_sec, 1e-9), 1),
    }
    if args.checkindex:
        from lucene_7_x_9_x_ray.state.checkindex import check_index

        summary["checkindex"] = check_index(args.index_dir)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
