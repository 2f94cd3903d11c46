"""Geo predicates and distance sort over lat/lon doc-values columns.

Ray-Data-native analogues of the LatLonPoint / LatLonDocValuesField query
surface (s84 core document/LatLonPoint.java:210-260 newDistanceQuery /
newBoxQuery; sandbox-then-core LatLonDocValuesField.java newDistanceSort):
coordinates live as two NUMERIC doc-values columns, predicates evaluate as
vectorized masks per segment, and the distance sort is a per-segment
vectorized haversine + top-k partial with a driver-side heap merge — the
TopFieldCollector shape, never a full ``ds.sort``.
"""

from __future__ import annotations

import heapq

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # IUGG mean earth radius, meters


def haversine_m(
    lat0: float, lon0: float, lat: np.ndarray, lon: np.ndarray
) -> np.ndarray:
    """Vectorized haversine distance (meters) from (lat0, lon0) to each
    (lat[i], lon[i]), double precision throughout — the SloppyMath.haversin
    role (s84 core util/SloppyMath.java:65) computed exactly rather than
    with the reference's table-driven approximations."""
    la1 = np.radians(lat0)
    la2 = np.radians(np.asarray(lat, dtype=np.float64))
    dla = la2 - la1
    dlo = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    a = np.sin(dla / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


def distance_sort_topk(
    searcher,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    k: int,
) -> list[tuple[float, int]]:
    """Top-k LIVE docs nearest to (lat, lon) as [(distance_m, global docID)]
    — the LatLonDocValuesField.newDistanceSort role. Per segment: decode
    the two doc-values columns once (reader-cached), one vectorized
    haversine, ``argpartition`` down to k candidates; driver merges
    n_segments × k partials with a heap. Ties break by ascending docID
    (the implicit Lucene secondary sort). Scale shape: per-segment work is
    columnar and independent (actor-pool friendly), driver state is
    O(segments × k)."""
    partials: list[tuple[float, int]] = []
    tombs = searcher.tombstones
    for r in searcher.readers:
        la = np.asarray(r.doc_values(lat_col), dtype=np.float64)
        lo = np.asarray(r.doc_values(lon_col), dtype=np.float64)
        dist = haversine_m(lat, lon, la, lo)
        # missing coordinates sort last (Lucene missing-value semantics
        # for distance sorts: Double.POSITIVE_INFINITY)
        dist = np.where(np.isnan(dist), np.inf, dist)
        gdocs = np.arange(len(dist), dtype=np.int64) + r.doc_base
        if len(tombs):
            live = searcher._live(gdocs)
            dist, gdocs = dist[live], gdocs[live]
        if len(dist) > k:
            # (distance, docID) lexsort keeps tie members deterministically
            # (equal distances straddling the k cut keep the lowest docIDs)
            idx = np.lexsort((gdocs, dist))[:k]
            dist, gdocs = dist[idx], gdocs[idx]
        partials.extend(zip(dist.tolist(), (int(g) for g in gdocs)))
    return heapq.nsmallest(k, partials)


def point_in_polygon(
    lat: np.ndarray, lon: np.ndarray, poly: list[tuple[float, float]]
) -> np.ndarray:
    """Vectorized even-odd crossing test (the Polygon.contains ray-cast of
    s84 core geo/Polygon.java / EdgeTree traversal, computed directly):
    True where (lat[i], lon[i]) lies inside the simple polygon given as
    [(lat, lon), ...] vertices (closed implicitly). Points exactly on an
    edge follow the half-open crossing rule (deterministic, same on both
    engine and oracle sides)."""
    la = np.asarray(lat, dtype=np.float64)
    lo = np.asarray(lon, dtype=np.float64)
    inside = np.zeros(len(la), dtype=bool)
    m = len(poly)
    for i in range(m):
        a_lat, a_lon = poly[i]
        b_lat, b_lon = poly[(i + 1) % m]
        crosses = (a_lat > la) != (b_lat > la)
        with np.errstate(invalid="ignore", divide="ignore"):
            x = (b_lon - a_lon) * (la - a_lat) / (b_lat - a_lat) + a_lon
        inside ^= crosses & (lo < x)
    return inside
