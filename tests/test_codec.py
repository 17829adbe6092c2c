"""Delta+varint posting-block codec: roundtrip + format properties."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from meresco_lucene_spark.index.codec import (
    decode_doc_block,
    encode_doc_block,
    varint_decode,
    varint_encode,
)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.int64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_known_bytes():
    # LEB128: 0->0x00, 127->0x7f, 128->0x80 0x01, 300->0xAC 0x02
    assert varint_encode(np.array([0])) == b"\x00"
    assert varint_encode(np.array([127])) == b"\x7f"
    assert varint_encode(np.array([128])) == b"\x80\x01"
    assert varint_encode(np.array([300])) == b"\xac\x02"


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == [int(v) for v in values]


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_doc_block_roundtrip(doc_ids, data):
    doc_ids = sorted(doc_ids)
    tfs = [data.draw(st.integers(min_value=1, max_value=1000)) for _ in doc_ids]
    db, tb = encode_doc_block(np.array(doc_ids), np.array(tfs))
    d2, t2 = decode_doc_block(db, tb)
    assert d2.tolist() == doc_ids
    assert t2.tolist() == tfs


def test_delta_compression_is_small():
    # Dense ascending ids => 1 byte per gap.
    ids = np.arange(10_000, dtype=np.int64) + 5
    tfs = np.ones(10_000, dtype=np.int64)
    db, tb = encode_doc_block(ids, tfs)
    assert len(db) <= 10_001  # first gap 5 is 1 byte, the rest 1 byte each
    assert len(tb) == 10_000
