"""Deterministic cross-engine hashes shared by pipelines and SQL oracles.

DuckDB's md5_number_lower(s) / md5_number_upper(s) are the little-endian
uint64 views of bytes 8..16 / 0..8 of md5(s); these helpers reproduce them
exactly so dedup/fingerprint pipelines can be value-hash-compared against
ANSI-SQL oracles.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


def md5_hex(s: str | bytes) -> str:
    b = s.encode("utf-8") if isinstance(s, str) else s
    return hashlib.md5(b).hexdigest()


def md5_lower64(s: str | bytes) -> int:
    """== DuckDB md5_number_lower(s)."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    return struct.unpack("<Q", hashlib.md5(b).digest()[8:16])[0]


def md5_upper64(s: str | bytes) -> int:
    """== DuckDB md5_number_upper(s)."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    return struct.unpack("<Q", hashlib.md5(b).digest()[:8])[0]


def md5_lower64_array(strings) -> np.ndarray:
    """Vectorized-enough md5_lower64 over a sequence -> uint64 array."""
    return np.fromiter((md5_lower64(s) for s in strings), dtype=np.uint64, count=len(strings))
