"""Property-based cross-implementation fuzz: engine codec vs mini-kernel.

The strongest evidence that the deletion-vector serialization follows
the public spec (and not merely its own habits) is that a SECOND,
code-independent decoder (`tools/minikernel.py`) reads every blob the
engine writes — over randomized inputs, not just the fixtures. These
properties drive `delta/roaring.py`'s writers against the mini-kernel's
readers (and vice versa for frame validation) across the container-type
boundaries the portable format switches at (array ≤4096 < bitmap, the
16-bit key split at 2^16, the 32-bit bitmap split at 2^32).
"""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_for_data_streaming_and_analysis_spark.delta import roaring

from tools import minikernel as mk

# position sets that cross every container boundary: dense low ranges
# (bitmap containers), sparse highs (array containers), multi-key
# 32-bit groups, and >2^32 values (64-bit bitmap map keys)
_positions = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=5_000),
        st.integers(min_value=60_000, max_value=70_000),
        st.integers(min_value=2**16 - 50, max_value=2**16 + 50),
        st.integers(min_value=2**32 - 50, max_value=2**32 + 2**20),
    ),
    max_size=6_000,
)


@settings(max_examples=60, deadline=None)
@given(_positions)
def test_minikernel_decodes_engine_rbm_blobs(positions):
    blob = roaring.serialize_rbm_array(positions)
    assert mk._decode_rbm_array(blob) == sorted(set(positions))


@settings(max_examples=60, deadline=None)
@given(_positions)
def test_engine_decodes_its_own_blobs_identically(positions):
    # sanity anchor: the two decoders agree with EACH OTHER, not just
    # with the writer
    blob = roaring.serialize_rbm_array(positions)
    assert roaring.deserialize_rbm_array(blob) == mk._decode_rbm_array(blob)


@settings(max_examples=40, deadline=None)
@given(_positions.filter(lambda p: len(p) > 0))
def test_minikernel_reads_engine_dv_entry_framing(tmp_path_factory, positions):
    """Full on-disk DV frame: version byte + <size BE><data><crc BE>
    entries — the engine packs, the mini-kernel path-reads ('p'
    storage) with full CRC/size validation."""
    entry, size = roaring.pack_dv_entry(positions)
    d = tmp_path_factory.mktemp("dv")
    p = d / "deletion_vector_x.bin"
    with open(p, "wb") as f:
        f.write(b"\x01" + bytes(entry))
    dv = {
        "storageType": "p",
        "pathOrInlineDv": str(p),
        "offset": 1,
        "sizeInBytes": size,
        "cardinality": len(set(positions)),
    }
    assert mk.dv_deleted_rows("unused", dv) == set(positions)


@settings(max_examples=30, deadline=None)
@given(_positions.filter(lambda p: len(p) > 0), st.integers(0, 3))
def test_both_decoders_refuse_corrupted_entries(
    tmp_path_factory, positions, mode
):
    """Flip a frame field and BOTH implementations must refuse —
    a decoder that guesses through corruption proves nothing."""
    entry, size = roaring.pack_dv_entry(positions)
    entry = bytearray(entry)
    if mode == 0:  # corrupt the magic
        entry[4] ^= 0xFF
    elif mode == 1:  # corrupt the CRC
        entry[-1] ^= 0xFF
    elif mode == 2:  # lie about the size
        size += 1
    else:  # corrupt a payload byte (CRC then mismatches)
        entry[len(entry) // 2] ^= 0x55
        # ensure we did not hit the CRC field itself
        if len(entry) - (len(entry) // 2) <= 4:
            entry[6] ^= 0x55
    d = tmp_path_factory.mktemp("dv")
    p = d / "deletion_vector_x.bin"
    with open(p, "wb") as f:
        f.write(b"\x01" + bytes(entry))
    dv = {
        "storageType": "p",
        "pathOrInlineDv": str(p),
        "offset": 1,
        "sizeInBytes": size,
        "cardinality": 1,
    }
    with pytest.raises(ValueError):
        mk.dv_deleted_rows("unused", dv)
    with pytest.raises(ValueError):
        roaring.read_descriptor("unused", dv)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=4, max_size=64).filter(lambda b: len(b) % 4 == 0))
def test_base85_roundtrip_across_implementations(data):
    enc = roaring.b85_encode(data)
    assert mk._b85d(enc) == data
    assert roaring.b85_decode(enc) == data
