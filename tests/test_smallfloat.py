"""SmallFloat int4/byte4 conformance (FIXTURES.md F4).

Pinned against the documented reference semantics
(solr-8.4.0/lucene/core/.../util/SmallFloat.java:113-181): exact encoding
below NUM_FREE_VALUES=24, 4-significant-bit bucketing above, order
preservation, round-trip idempotence.
"""

import numpy as np
import pytest

from lucene_7_x_9_x_ray.functions import smallfloat as sf


def test_free_values_exact():
    assert sf.NUM_FREE_VALUES == 24
    for i in range(24):
        assert int(sf.int_to_byte4(i)) == i
        assert int(sf.byte4_to_int(np.uint8(i))) == i


def test_long_to_int4_reference_values():
    # subnormals (numBits < 4) encode as themselves
    for i in range(8):
        assert int(sf.long_to_int4(i)) == i
    # longToInt4(Integer.MAX_VALUE) == 231 -> NUM_FREE_VALUES == 24
    assert int(sf.long_to_int4(2**31 - 1)) == 231


def test_round_trip_identity_below_free():
    lengths = np.arange(0, 24)
    assert np.array_equal(sf.byte4_to_int(sf.int_to_byte4(lengths)), lengths)


def test_round_trip_lossy_but_ordered():
    lengths = np.unique(
        np.concatenate(
            [
                np.arange(0, 4096),
                np.geomspace(1, 2**30, 4000).astype(np.int64),
                np.array([2**31 - 1]),
            ]
        )
    )
    enc = sf.int_to_byte4(lengths)
    dec = sf.byte4_to_int(enc)
    # decoded value never exceeds input (truncation), within 4-bit precision
    assert np.all(dec <= lengths)
    # encoding is monotone non-decreasing in the input
    assert np.all(np.diff(enc.astype(np.int64)) >= 0)
    # re-encoding a decoded value gives the same byte (idempotence)
    assert np.array_equal(sf.int_to_byte4(dec), enc)
    # 4 significant bits: relative error < 1/8 above the exact range
    big = lengths >= 24
    rel = (lengths[big] - dec[big]) / np.maximum(dec[big], 1)
    assert rel.max() < 0.125 + 1e-9


def test_all_256_bytes_decode_strictly_increasing():
    dec = sf.byte4_to_int(np.arange(256, dtype=np.uint8))
    assert np.all(np.diff(dec) > 0)
    assert dec[0] == 0
    # byte 255 decodes to 24 + int4ToLong(231) = 24 + (15 << 27); this is the
    # bucket Integer.MAX_VALUE truncates into (encoding is lossy-down)
    assert dec[255] == 24 + ((7 | 8) << 27)
    assert int(sf.int_to_byte4(2**31 - 1)) == 255


def test_scalar_matches_vector():
    vals = [0, 1, 23, 24, 25, 100, 255, 1000, 123456, 2**31 - 1]
    vec = sf.int_to_byte4(np.array(vals))
    for v, b in zip(vals, vec):
        assert sf._int_to_byte4_scalar(v) == int(b)


def test_negative_rejected():
    with pytest.raises(ValueError):
        sf.long_to_int4(np.array([-1]))
