"""rANS 4x8 codec round-trip + format properties (CRAM 3.0 spec §8.4)."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from adam_spark.sources.rans import rans_compress, rans_uncompress


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"A",
        b"AB",
        b"ABC",
        b"ABCD",
        b"ACGT" * 1000,
        bytes(range(256)) * 8,
        b"\x00" * 4097,
        b"qqqqqIIIIIJJJJJ" * 333,
    ],
)
def test_roundtrip_fixed(order, data):
    assert rans_uncompress(rans_compress(data, order)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2000), st.integers(min_value=0, max_value=1))
def test_roundtrip_property(data, order):
    assert rans_uncompress(rans_compress(data, order)) == data


def test_header_layout():
    payload = rans_compress(b"ACGTACGT", 0)
    order, csize, usize = struct.unpack_from("<BII", payload, 0)
    assert order == 0 and usize == 8 and csize == len(payload) - 9


def test_order1_beats_order0_on_conditioned_data():
    data = b"ACGT" * 4096  # perfectly predictable from predecessor
    assert len(rans_compress(data, 1)) < len(rans_compress(data, 0))


def test_bad_payload_rejected():
    with pytest.raises(ValueError):
        rans_uncompress(struct.pack("<BII", 2, 0, 5))
    with pytest.raises(ValueError):
        rans_uncompress(struct.pack("<BII", 0, 99, 5) + b"x")
