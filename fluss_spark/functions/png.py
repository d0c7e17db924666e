"""Minimal pure-stdlib PNG codec with a PIL-compatible mini-surface.

Implements the public PNG format (W3C PNG spec / RFC 2083): 8-byte
signature, IHDR/IDAT/IEND chunks, zlib-compressed scanlines with a
per-row filter byte. Scope: 8-bit greyscale (color type 0) and
truecolor RGB (color type 2), non-interlaced; decode handles all five
scanline filters (None/Sub/Up/Average/Paeth), encode emits filter 0.

Purpose: the multimodal kernels' `decode_mode="real"` path must be
executable in environments without Pillow (this image has none) — the
engine probes PIL first and falls back to this module, so "real" decode
/ resize / re-encode run end-to-end for PNG payloads. The mini-surface
mirrors exactly what the kernels call on PIL: `open(fp)` -> object with
`.size`, `.format`, `.resize((w, h))`, `.save(fp, format="PNG")`,
`.tobytes()`.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3}  # color type -> samples per pixel

# marks this module as the limited (PNG-only) fallback codec:
# decode_mode="auto" must NOT auto-upgrade to "real" on its account —
# arbitrary payloads (JPEG, fake md5 bytes) would crash instead of
# falling back to the fake path. Explicit decode_mode="real" uses it.
IS_FALLBACK = True


class PngImage:
    """Decoded raster: row-major 8-bit samples, `channels` per pixel."""

    format = "PNG"

    def __init__(self, width: int, height: int, channels: int, pixels: bytes):
        if len(pixels) != width * height * channels:
            raise ValueError("pixel buffer does not match dimensions")
        self.width, self.height, self.channels = width, height, channels
        self.pixels = bytes(pixels)

    @property
    def size(self) -> tuple[int, int]:
        return (self.width, self.height)

    def tobytes(self) -> bytes:
        return self.pixels

    def resize(self, size: tuple[int, int]) -> "PngImage":
        """Nearest-neighbor resample (the PIL.Image.resize subset the
        resize kernel uses)."""
        w2, h2 = size
        if w2 <= 0 or h2 <= 0:
            raise ValueError("resize dimensions must be positive")
        ch, w, h = self.channels, self.width, self.height
        src = self.pixels
        out = bytearray(w2 * h2 * ch)
        for y2 in range(h2):
            row = (y2 * h // h2) * w * ch
            orow = y2 * w2 * ch
            for x2 in range(w2):
                s = row + (x2 * w // w2) * ch
                o = orow + x2 * ch
                out[o : o + ch] = src[s : s + ch]
        return PngImage(w2, h2, ch, bytes(out))

    def save(self, fp, format: str = "PNG") -> None:
        if format.upper() != "PNG":
            raise ValueError(f"this codec writes PNG only, got {format!r}")
        fp.write(encode(self))


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode(img: PngImage) -> bytes:
    """Serialize with filter 0 on every scanline (spec-minimal, always
    valid; compression ratio is not this codec's job)."""
    color_type = 0 if img.channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", img.width, img.height, 8, color_type, 0, 0, 0)
    stride = img.width * img.channels
    raw = b"".join(
        b"\x00" + img.pixels[y * stride : (y + 1) * stride] for y in range(img.height)
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> bytes:
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG: decompressed data does not match dimensions")
    prev = bytearray(stride)
    out = bytearray()
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out += line
        prev = line
    return bytes(out)


def decode(data: bytes) -> PngImage:
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("PNG: truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != zlib.crc32(tag + payload) & 0xFFFFFFFF:
            raise ValueError(f"PNG: bad CRC in {tag!r}")
        if tag == b"IHDR":
            ihdr = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color_type not in _CHANNELS:
        raise ValueError(
            f"PNG: unsupported bit depth/color type {depth}/{color_type} "
            "(codec scope: 8-bit greyscale or RGB)"
        )
    if comp or filt or interlace:
        raise ValueError("PNG: unsupported compression/filter/interlace method")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(idat)
    return PngImage(width, height, channels, _unfilter(raw, width, height, channels))


def open(fp) -> PngImage:  # noqa: A001 - deliberate PIL.Image.open shadow
    """PIL.Image.open-compatible entry point (file-like object in)."""
    return decode(fp.read())
