"""Delta + varint posting-block codec, numpy-vectorized.

The compressed segment format stores, per (term, block) row:
  doc_ids BINARY  -- strictly increasing int64 doc ids, delta-gap then LEB128 varint
  tfs     BINARY  -- term frequencies, LEB128 varint

LEB128: little-endian base-128, 7 payload bits per byte, high bit =
continuation — the standard public varint format (protobuf/Lucene VInt
are the same idea).  Encode/decode are fully vectorized: no per-value
Python loops; the byte expansion is computed with numpy shifting/masking
so a pandas-UDF can push millions of postings per batch.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64-bit worst case


def varint_sizes(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    nz = np.maximum(v, 1)
    nbytes = ((64 - _clz64(nz)) + 6) // 7
    return np.maximum(nbytes, 1).astype(np.int64)


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64/int64 array -> bytes."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = varint_sizes(v)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # Byte slot index ranges per value.
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # For each output byte, which value does it belong to and which group?
    owner = np.repeat(np.arange(v.size), nbytes)
    pos_in_value = np.arange(total) - starts[owner]
    shifted = v[owner] >> (pos_in_value.astype(np.uint64) * np.uint64(7))
    payload = (shifted & np.uint64(0x7F)).astype(np.uint8)
    is_last = pos_in_value == (nbytes[owner] - 1)
    out[:] = payload | np.where(is_last, 0, 0x80).astype(np.uint8)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Vectorized LEB128 decode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # Value index for each byte = number of completed values before it.
    value_idx = np.zeros(b.size, dtype=np.int64)
    value_idx[1:] = np.cumsum(is_last[:-1])
    n_values = int(is_last.sum())
    # Position of each byte within its value.
    starts_mask = np.ones(b.size, dtype=bool)
    starts_mask[1:] = is_last[:-1]
    start_positions = np.flatnonzero(starts_mask)
    pos_in_value = np.arange(b.size) - start_positions[value_idx]
    contrib = (b & 0x7F).astype(np.uint64) << (pos_in_value.astype(np.uint64) * np.uint64(7))
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(out, value_idx, contrib)
    return out


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 array (vectorized via float64 exponent
    with an exact integer fallback for >53-bit values)."""
    v = v.astype(np.uint64)
    bits = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x >= (np.uint64(1) << np.uint64(shift))
        bits[mask] += shift
        x[mask] >>= np.uint64(shift)
    # bits = floor(log2(v)) for v>0; bit length = bits+1
    return 64 - (bits + 1)


def encode_doc_block(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Delta-gap the sorted doc ids then varint both arrays."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    gaps = np.empty_like(doc_ids)
    if doc_ids.size:
        gaps[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    return varint_encode(gaps), varint_encode(np.asarray(tfs, dtype=np.int64))


def decode_doc_block(doc_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    gaps = varint_decode(doc_bytes).astype(np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = varint_decode(tf_bytes).astype(np.int64)
    return doc_ids, tfs
