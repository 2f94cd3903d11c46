"""Shared pipeline plumbing.

``sized_read`` is the one read entry point the operator pipelines use:
``ray.data.read_parquet`` with a block count derived from the table's
actual row count. Ray's default splits even a 5 000-row file into
~2x-CPU near-empty blocks, and every downstream ``groupby``/``sort``
inherits that block count — at benchmark scale the per-task constants
(scheduling, (de)serialization, per-block aggregate setup) then dwarf
the useful work by an order of magnitude. Sizing blocks by rows keeps
each task big enough to amortize its constants while still fanning out
on real data: the block count grows linearly with the input, capped at
16x the cluster's CPUs (past that, ``map_batches``' ``batch_size``
provides intra-block chunking and the streaming executor pipelines
blocks, so more blocks only add scheduling load).
"""

from __future__ import annotations

import math

__all__ = ["sized_read", "HEAVY_ROWS_PER_BLOCK", "LIGHT_ROWS_PER_BLOCK"]

# heavy per-row kernels (shingling, minhash, per-doc matmul): small blocks
# so a handful of rows still spreads across the cluster. Round-4
# re-measure after the shingle kernel vectorization (per-row Python set
# -> object-concat n-grams + lexsort dedup, ~10x less work per row):
# at sf0.1/32 cpus op_minhash_lsh is 1.4 s at 256 rows/block vs 2.1 s at
# the old 64 (and 5.1 s at 1024 — candidate-stage starvation returns),
# so the sweet spot moved up 4x with the kernel cost.
HEAVY_ROWS_PER_BLOCK = 256
# light columnar kernels (hash, partial aggregates): big blocks, the work
# per row is nanoseconds and the task constant is the whole cost
LIGHT_ROWS_PER_BLOCK = 32_768


def _cluster_cpus() -> int:
    try:
        import ray

        return int(ray.cluster_resources().get("CPU", 32)) or 32
    except Exception:
        return 32


def sized_read(path: str, columns: list[str] | None = None,
               rows_per_block: int = LIGHT_ROWS_PER_BLOCK,
               row_filter=None):
    """``read_parquet`` with ``override_num_blocks`` matched to table size.
    ``row_filter`` (a pyarrow dataset expression) pushes the predicate into
    the parquet scan — row-group zone maps prune before rows ever reach a
    worker."""
    import pyarrow.parquet as pq
    import ray.data as rd

    n = pq.read_metadata(path).num_rows
    blocks = max(1, min(math.ceil(n / rows_per_block), 16 * _cluster_cpus()))
    kw = {} if row_filter is None else {"filter": row_filter}
    return rd.read_parquet(path, columns=columns, override_num_blocks=blocks, **kw)
