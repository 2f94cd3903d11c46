"""HNSW graph — Malkov & Yashunin (2016) hierarchical navigable small
world, implemented from the published paper (Algorithms 1-5). This is the
graph behind Lucene 9.x KnnVectorQuery (s84-era format documented in
blog/Lucene/索引文件/vec&vem&vex/; LuceneDemo9.1.0 TestKNNQuery.java) —
re-implemented from the public algorithm, not ported.

Similarity = inner product over L2-normalized vectors (cosine). Graphs
are built per PARTITION (the Lucene per-segment KNN model: each segment
owns an independent graph; queries search every graph and merge top-k),
which is what makes the build embarrassingly parallel across Ray tasks.
"""

from __future__ import annotations

import heapq

import numpy as np

__all__ = ["HNSWGraph", "build_hnsw", "search_hnsw"]


class HNSWGraph:
    """In-memory HNSW over a fixed vector matrix (rows = local ids)."""

    def __init__(self, vectors: np.ndarray, M: int = 16, ef_construction: int = 100,
                 seed: int = 42):
        self.vecs = vectors  # L2-normalized float32 [n, dim]
        self.M = M
        self.M0 = 2 * M
        self.ef_construction = ef_construction
        self.mL = 1.0 / np.log(M)
        self.entry = -1
        self.max_level = -1
        # neighbors[level][node] -> np.int64 array
        self.neighbors: list[dict[int, np.ndarray]] = []
        self._rng = np.random.default_rng(seed)

    # -- distance (similarity: higher = closer) -----------------------------
    def _sims(self, q: np.ndarray, ids) -> np.ndarray:
        return self.vecs[np.asarray(ids, dtype=np.int64)] @ q

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, level: int):
        """Algorithm 2: best-first search of one layer; returns a list of
        (sim, id) of size <= ef, best-last in heap form."""
        nbrs = self.neighbors[level]
        visited = {entry}
        d0 = float(self.vecs[entry] @ q)
        cand: list[tuple[float, int]] = [(-d0, entry)]  # max-heap via neg
        best: list[tuple[float, int]] = [(d0, entry)]  # min-heap of results
        while cand:
            negd, c = heapq.heappop(cand)
            if -negd < best[0][0] and len(best) >= ef:
                break
            neigh = nbrs.get(c)
            if neigh is None or len(neigh) == 0:
                continue
            new = [int(x) for x in neigh if int(x) not in visited]
            if not new:
                continue
            visited.update(new)
            sims = self._sims(q, new)
            for nid, s in zip(new, sims):
                s = float(s)
                if len(best) < ef or s > best[0][0]:
                    heapq.heappush(cand, (-s, nid))
                    heapq.heappush(best, (s, nid))
                    if len(best) > ef:
                        heapq.heappop(best)
        return best

    def _select_neighbors(self, q: np.ndarray, cand: list[tuple[float, int]],
                          m: int) -> np.ndarray:
        """Algorithm 4 heuristic: favor diverse neighbors — a candidate is
        kept only if it is closer to q than to every already-kept one.
        Vectorized: the kept set grows in a preallocated matrix, one gemv
        per candidate."""
        order = sorted(cand, key=lambda x: -x[0])
        ids = np.asarray([cid for _, cid in order], dtype=np.int64)
        sims_q = np.asarray([s for s, _ in order])
        X = self.vecs[ids]
        G = X @ X.T  # candidate-vs-candidate sims: ONE gemm per call
        out_idx: list[int] = []
        for i in range(len(ids)):
            if len(out_idx) >= m:
                break
            if out_idx and bool((G[i, out_idx] > sims_q[i]).any()):
                continue
            out_idx.append(i)
        if len(out_idx) < m:  # keepPrunedConnections: fill with the remainder
            chosen = set(out_idx)
            for i in range(len(ids)):
                if len(out_idx) >= m:
                    break
                if i not in chosen:
                    out_idx.append(i)
        return ids[out_idx]

    def add(self, node: int) -> None:
        """Algorithm 1: insert one node (vector already in self.vecs)."""
        level = int(-np.log(max(self._rng.random(), 1e-12)) * self.mL)
        while len(self.neighbors) <= level:
            self.neighbors.append({})
        q = self.vecs[node]
        if self.entry < 0:
            for lc in range(level + 1):
                self.neighbors[lc][node] = np.empty(0, dtype=np.int64)
            self.entry = node
            self.max_level = level
            return
        ep = self.entry
        for lc in range(self.max_level, level, -1):
            best = self._search_layer(q, ep, 1, lc)
            ep = max(best)[1]
        for lc in range(min(level, self.max_level), -1, -1):
            best = self._search_layer(q, ep, self.ef_construction, lc)
            m = self.M0 if lc == 0 else self.M
            sel = self._select_neighbors(q, best, m)
            self.neighbors[lc][node] = sel
            slack = max(2, m // 2)  # amortize reverse-link pruning: let
            # lists overflow a little, prune back to m every ~slack adds
            # (oversized lists only improve recall; finalize() restores the
            # paper's degree bound before search/persistence)
            for nb in sel:
                nb = int(nb)
                cur = self.neighbors[lc].get(nb)
                cur = (
                    np.asarray([node], dtype=np.int64)
                    if cur is None or len(cur) == 0
                    else np.append(cur, node)
                )
                if len(cur) > m + slack:
                    sims = self._sims(self.vecs[nb], cur)
                    cur = self._select_neighbors(
                        self.vecs[nb], list(zip(sims.tolist(), cur.tolist())), m
                    )
                self.neighbors[lc][nb] = cur
            ep = max(best)[1]
        if level > self.max_level:
            self.max_level = level
            self.entry = node

    def finalize(self) -> None:
        """Prune any slack-overflowed neighbor lists back to the paper's
        degree bounds (M0 at level 0, M above)."""
        for lc, d in enumerate(self.neighbors):
            m = self.M0 if lc == 0 else self.M
            for nb, cur in d.items():
                if len(cur) > m:
                    sims = self._sims(self.vecs[nb], cur)
                    d[nb] = self._select_neighbors(
                        self.vecs[nb], list(zip(sims.tolist(), cur.tolist())), m
                    )

    def search(self, q: np.ndarray, k: int, ef: int = 64):
        """Algorithm 5: greedy descend upper layers, ef-search layer 0.
        Returns (local ids, sims) best-first."""
        if self.entry < 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        ep = self.entry
        for lc in range(self.max_level, 0, -1):
            best = self._search_layer(q, ep, 1, lc)
            ep = max(best)[1]
        best = self._search_layer(q, ep, max(ef, k), 0)
        order = sorted(best, key=lambda x: (-x[0], x[1]))[:k]
        ids = np.asarray([i for _, i in order], dtype=np.int64)
        sims = np.asarray([s for s, _ in order], dtype=np.float64)
        return ids, sims

    # -- persistence ---------------------------------------------------------
    def to_arrays(self) -> dict:
        """Flatten to numpy arrays for npz persistence."""
        out = {"entry": np.int64(self.entry), "max_level": np.int64(self.max_level),
               "n_levels": np.int64(len(self.neighbors))}
        for lc, d in enumerate(self.neighbors):
            nodes = np.asarray(sorted(d.keys()), dtype=np.int64)
            flat = (
                np.concatenate([d[int(n)] for n in nodes])
                if len(nodes)
                else np.empty(0, dtype=np.int64)
            )
            counts = np.asarray([len(d[int(n)]) for n in nodes], dtype=np.int64)
            out[f"nodes_{lc}"] = nodes
            out[f"flat_{lc}"] = flat
            out[f"counts_{lc}"] = counts
        return out

    @classmethod
    def from_arrays(cls, vectors: np.ndarray, arrays: dict) -> "HNSWGraph":
        g = cls(vectors)
        g.entry = int(arrays["entry"])
        g.max_level = int(arrays["max_level"])
        g.neighbors = []
        for lc in range(int(arrays["n_levels"])):
            nodes = arrays[f"nodes_{lc}"]
            flat = arrays[f"flat_{lc}"]
            counts = arrays[f"counts_{lc}"]
            d: dict[int, np.ndarray] = {}
            off = 0
            for n, c in zip(nodes, counts):
                d[int(n)] = flat[off : off + int(c)]
                off += int(c)
            g.neighbors.append(d)
        return g


def build_hnsw(vectors: np.ndarray, M: int = 16, ef_construction: int = 100,
               seed: int = 42) -> HNSWGraph:
    g = HNSWGraph(vectors, M=M, ef_construction=ef_construction, seed=seed)
    for i in range(len(vectors)):
        g.add(i)
    g.finalize()
    return g


def search_hnsw(graph: HNSWGraph, q: np.ndarray, k: int, ef: int = 64):
    return graph.search(q, k, ef)
