"""WAND scaled-integer score math, faithful to the reference's rounding.

Behavioral reference (re-implemented from scratch):
solr-8.4.0/lucene/core/src/java/org/apache/lucene/search/WANDScorer.java:54-106
- scalingFactor(f): the power of two such that f * 2^sf lands in (2^15, 2^16];
  scalingFactor(0) = scalingFactor(MIN_VALUE) - 1,
  scalingFactor(+inf) = scalingFactor(MAX_VALUE) + 1.
- scaleMaxScore: scalb then ceil (round UP so no match is missed); values
  that overflow 2^16 become the 32-bit all-ones "infinity".
- scaleMinScore: scalb then floor (round DOWN).

Summing rounded-up per-clause max scores and comparing against the
rounded-down min competitive score in exact integer arithmetic is what makes
WAND pruning safe; doing it in floats would risk dropping true hits.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["scaling_factor", "scale_max_score", "scale_min_score", "INF_SCALED"]

INF_SCALED = (1 << 32) - 1  # "+Infinity in practice" sentinel

_FLT_MIN_SUBNORMAL = np.nextafter(np.float32(0), np.float32(1))  # Float.MIN_VALUE
_FLT_MAX = float(np.finfo(np.float32).max)


def scaling_factor(f: float) -> int:
    """Power of two p such that f * 2^p is in (2^15, 2^16]."""
    if f < 0:
        raise ValueError("Scores must be positive or null")
    if f == 0:
        return scaling_factor(float(_FLT_MIN_SUBNORMAL)) - 1
    if math.isinf(f):
        return scaling_factor(_FLT_MAX) + 1
    d = float(f)
    # exponent of nextDown(d): Math.getExponent == floor(log2) for normal
    # doubles; frexp returns (m, e) with m in [0.5, 1), so e - 1.
    nd = math.nextafter(d, -math.inf)
    _, e = math.frexp(nd)
    return 15 - (e - 1)


def scale_max_score(max_score: float, sf: int) -> int:
    """Scale + round UP; overflow -> INF_SCALED."""
    assert not math.isnan(max_score) and max_score >= 0
    scaled = math.ldexp(float(max_score), sf)
    if scaled > (1 << 16):
        return INF_SCALED
    return int(math.ceil(scaled))


def scale_min_score(min_score: float, sf: int) -> int:
    """Scale + round DOWN."""
    assert not math.isnan(min_score) and min_score >= 0
    return int(math.floor(math.ldexp(float(min_score), sf)))
