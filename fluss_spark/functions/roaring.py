"""Pure-Python RoaringBitmap portable-format codec (32- and 64-bit).

The reference persists bitmap aggregate values as the bytes of
`RoaringBitmap.serialize()` after `runOptimize()`
(fluss-flink/.../functions/bitmap/BitmapUtils.java:45-53, used by
RbBuildAggFunction and FieldRoaringBitmap32/64Agg). This module speaks
that wire format — the RoaringFormatSpec "portable" layout — so bitmap
blobs written by the reference can be read here and vice versa:

  32-bit stream (little-endian throughout):
    cookie  u32   12346 (no run containers; followed by u32 n_containers)
                  or 12347 | (n_containers-1) << 16, followed by a
                  ceil(n/8)-byte run-container flag bitset
    desc    n x (u16 key, u16 cardinality-1)
    offsets n x u32 byte position of each container from stream start
            (present always for cookie 12346; for 12347 only when n >= 4)
    containers, each one of
      array : cardinality x u16 sorted values          (card <= 4096)
      bitmap: 1024 x u64 = 8 KiB bit set               (card >  4096)
      run   : u16 n_runs, then n_runs x (u16 start, u16 length-1)

  64-bit stream ("portable" Roaring64NavigableMap format):
    u64 n_buckets, then per bucket: u32 high-32-bits + a 32-bit stream.

Serialization applies the same representation rule as Java's
runOptimize(): a container is written as runs iff that form is strictly
smaller than the array/bitmap form, so output bytes match the
reference's for the same value set.
"""

from __future__ import annotations

import struct
from collections.abc import Iterable

_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # with run containers, offsets appear only at n >= 4
_ARRAY_MAX = 4096


# --------------------------------------------------------------------- #
# container encoding
# --------------------------------------------------------------------- #


def _runs_of(lows: list[int]) -> list[tuple[int, int]]:
    """Maximal runs [(start, length-1), ...] of a sorted u16 list."""
    runs: list[tuple[int, int]] = []
    start = prev = lows[0]
    for v in lows[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start))
        start = prev = v
    runs.append((start, prev - start))
    return runs


def _encode_container(lows: list[int]) -> tuple[bytes, bool]:
    """(container bytes, is_run). Representation rule = Container.runOptimize:
    runs win iff strictly smaller than the best of array/bitmap."""
    card = len(lows)
    runs = _runs_of(lows)
    run_size = 2 + 4 * len(runs)
    plain_size = 2 * card if card <= _ARRAY_MAX else 8192
    if run_size < plain_size:
        out = struct.pack("<H", len(runs))
        out += b"".join(struct.pack("<HH", s, l) for s, l in runs)
        return out, True
    if card <= _ARRAY_MAX:
        return struct.pack(f"<{card}H", *lows), False
    words = [0] * 1024
    for v in lows:
        words[v >> 6] |= 1 << (v & 63)
    return struct.pack("<1024Q", *words), False


def roaring32_serialize(values: Iterable[int]) -> bytes:
    """Serialize u32 values to the portable 32-bit format (runOptimized)."""
    vals = sorted({v & 0xFFFFFFFF for v in values})
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    n = len(keys)
    encoded = [_encode_container(buckets[k]) for k in keys]
    has_run = any(r for _, r in encoded)

    out = bytearray()
    if has_run:
        out += struct.pack("<I", _COOKIE_RUN | ((n - 1) << 16))
        flags = bytearray((n + 7) // 8)
        for i, (_, is_run) in enumerate(encoded):
            if is_run:
                flags[i // 8] |= 1 << (i % 8)
        out += flags
    else:
        out += struct.pack("<II", _COOKIE_NO_RUN, n)
    for k in keys:
        out += struct.pack("<HH", k, len(buckets[k]) - 1)
    write_offsets = (not has_run) or n >= _NO_OFFSET_THRESHOLD
    if write_offsets:
        pos = len(out) + 4 * n
        for body, _ in encoded:
            out += struct.pack("<I", pos)
            pos += len(body)
    for body, _ in encoded:
        out += body
    return bytes(out)


def _parse32(data: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one 32-bit stream at `pos`; returns (values, end position)."""
    (cookie,) = struct.unpack_from("<I", data, pos)
    pos += 4
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        flags = data[pos : pos + nbytes]
        pos += nbytes
        is_run = [bool(flags[i // 8] >> (i % 8) & 1) for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
        is_run = [False] * n
        has_offsets = True
    else:
        raise ValueError(f"not a RoaringBitmap stream (cookie={cookie & 0xFFFF})")
    desc = [struct.unpack_from("<HH", data, pos + 4 * i) for i in range(n)]
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # containers are stored in key order; read sequentially
    values: list[int] = []
    for i, (key, card_m1) in enumerate(desc):
        card = card_m1 + 1
        high = key << 16
        if is_run[i]:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", data, pos)
                pos += 4
                values.extend(high | v for v in range(start, start + length_m1 + 1))
        elif card <= _ARRAY_MAX:
            lows = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(high | v for v in lows)
        else:
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            for w_i, w in enumerate(words):
                base = high | (w_i << 6)
                while w:
                    b = w & -w
                    values.append(base | b.bit_length() - 1)
                    w ^= b
    return values, pos


def roaring32_deserialize(data: bytes) -> list[int]:
    """Deserialize a portable 32-bit stream (array/bitmap/run containers)."""
    values, _ = _parse32(bytes(data), 0)
    return values


def roaring64_serialize(values: Iterable[int]) -> bytes:
    """Portable 64-bit format: u64 bucket count, then per high-32 bucket a
    u32 key + 32-bit stream (Roaring64NavigableMap portable layout)."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        v &= 0xFFFFFFFFFFFFFFFF
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for high in sorted(buckets):
        out += struct.pack("<I", high)
        out += roaring32_serialize(buckets[high])
    return bytes(out)


def roaring64_deserialize(data: bytes) -> list[int]:
    data = bytes(data)
    (n_buckets,) = struct.unpack_from("<Q", data, 0)
    pos = 8
    values: list[int] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", data, pos)
        pos += 4
        lows, pos = _parse32(data, pos)
        values.extend((high << 32) | v for v in lows)
    return values
