"""Rounding that matches DuckDB's ROUND(DOUBLE, n) (half-away-from-zero).

Python's round() is banker's (half-even), so values landing exactly on a
decimal boundary (e.g. 9/128 = 0.0703125 at 6 digits) disagree with the
SQL oracles; every rounded output column in pipelines/ goes through these
helpers instead.
"""

from __future__ import annotations

import math

import numpy as np


def round_half_away(x: float, nd: int) -> float:
    m = 10.0 ** nd
    v = float(x) * m
    return math.copysign(math.floor(abs(v) + 0.5), v) / m


def round_half_away_np(x: np.ndarray, nd: int) -> np.ndarray:
    m = 10.0 ** nd
    v = np.asarray(x, dtype=np.float64) * m
    return np.copysign(np.floor(np.abs(v) + 0.5), v) / m
