"""Hadoop variable-length integer ("VLong" / "VInt") codec.

Wire format (reference: ``src/Data/Hadoop/SequenceFile/Parser.hs:135-152``,
``cbits/decode.c:40-72``, ``src/Data/Hadoop/Writable.hs:140-147``):

* first byte ``b`` interpreted as signed int8;
* ``b >= -112``  → the value is ``b`` itself (1 byte total);
* ``b <  -120``  → negative number, ``size = -119 - b`` extra... no:
  ``-119 - b`` is the *total* size; value accumulates big-endian over
  the following ``size-1`` bytes and is bitwise-complemented;
* ``-120 <= b < -112`` → positive, total size ``-111 - b``.
"""

from __future__ import annotations

import numpy as np


def decode_vint(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one Hadoop varint at ``pos``; returns (value, new_pos)."""
    b = buf[pos]
    if b >= 0x80:
        b -= 0x100  # to signed
    pos += 1
    if b >= -112:
        return b, pos
    negative = b < -120
    size = (-119 - b) if negative else (-111 - b)
    value = 0
    for _ in range(size - 1):
        value = (value << 8) | buf[pos]
        pos += 1
    if negative:
        value = ~value
    return value, pos


def encode_vint(value: int) -> bytes:
    """Encode one Hadoop varint (matches Hadoop WritableUtils.writeVLong)."""
    if -112 <= value <= 127:
        return bytes([value & 0xFF])
    negative = value < 0
    if negative:
        value = ~value
    nbytes = (value.bit_length() + 7) // 8
    first = (-120 - nbytes) if negative else (-112 - nbytes)
    return bytes([first & 0xFF]) + value.to_bytes(nbytes, "big")


def vint_sizes(first_bytes: np.ndarray) -> np.ndarray:
    """Vectorized: total encoded size of each varint given its first byte.

    ``first_bytes`` is a uint8 array of the first byte of each varint.
    Mirrors ``Writable.hs:140-147`` / Hadoop ``decodeVIntSize``.
    """
    b = first_bytes.astype(np.int16)
    b = np.where(b >= 128, b - 256, b)
    return np.where(
        b >= -112, 1, np.where(b < -120, -119 - b, -111 - b)
    ).astype(np.int64)


def decode_vint_array(buf: bytes | memoryview, count: int) -> np.ndarray:
    """Decode ``count`` back-to-back Hadoop varints (a lengths buffer).

    Vectorized for the overwhelmingly common all-1-byte case (per-record
    lengths < 128, e.g. short Text values); falls back to a Python loop
    only for the residue of multi-byte entries.
    """
    arr = np.frombuffer(buf, dtype=np.uint8)
    if count == 0:
        return np.zeros(0, dtype=np.int64)
    if len(arr) == count:
        # every varint is a single byte → pure vector path
        b = arr.astype(np.int16)
        b = np.where(b >= 128, b - 256, b)
        if (b < -112).any():
            raise ValueError("lengths buffer size mismatch")
        return b.astype(np.int64)
    out = np.empty(count, dtype=np.int64)
    data = bytes(buf)
    pos = 0
    for i in range(count):
        out[i], pos = decode_vint(data, pos)
    if pos != len(data):
        raise ValueError("trailing bytes after varint lengths")
    return out


def encode_vint_array(values: np.ndarray) -> bytes:
    """Encode an int array as back-to-back Hadoop varints.

    Vectorized fast path when every value fits one byte (0..127).
    """
    values = np.asarray(values, dtype=np.int64)
    if len(values) and (values >= -112).all() and (values <= 127).all():
        return values.astype(np.int8).tobytes()
    return b"".join(encode_vint(int(v)) for v in values)
