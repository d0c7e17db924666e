"""Vendored pure-stdlib YUV4MPEG2 (.y4m) video codec.

YUV4MPEG2 is the uncompressed interchange format of the mjpegtools /
ffmpeg ecosystem (`ffmpeg -f yuv4mpeg`): an ASCII stream header

    YUV4MPEG2 W<width> H<height> F<num>:<den> [Ip] [A1:1] [C420jpeg]\\n

followed by frames, each an ASCII `FRAME[params]\\n` marker plus raw
planar YUV bytes (layout fixed by the header's colourspace tag:
C420* = Y w*h + U,V at (w/2)*(h/2); C422 = U,V at (w/2)*h;
C444 = full planes; Cmono = Y only). Spec: the yuv4mpeg(5) man page
shipped with mjpegtools — public knowledge, no reference code involved.

The module exposes a deliberately PyAV-shaped surface so
`operators.multimodal._video_codec()` can fall back to it when `av` is
not importable (mirroring the PNG fallback for PIL,
reference-independent): `open(file_like)` returns a container whose
`.decode(video=0)` yields frames with `.to_image().tobytes()`,
`width`, `height`. Scope is Y4M-only — arbitrary containers (mp4 etc.)
still require PyAV and raise a clear error here.

YUV -> RGB uses BT.601 full-range coefficients (the JPEG/JFIF matrix —
what C420jpeg/C444 tag data is, and the common default for Y4M
produced from JPEG-chroma sources).
"""

from __future__ import annotations

import io
from dataclasses import dataclass

try:  # numpy is a hard dependency of the repo (kernels); guard anyway
    import numpy as np
except ImportError:  # pragma: no cover
    np = None

_MAGIC = b"YUV4MPEG2"

# marks this module as the limited vendored fallback (multimodal's
# decode_mode="auto" requires a full codec; explicit "real" accepts us)
IS_FALLBACK = True


class Y4mError(ValueError):
    pass


def _plane_shapes(w: int, h: int, cspace: str) -> list[tuple[int, int]]:
    """(height, width) of the Y, U, V planes for a colourspace tag."""
    if cspace.startswith("420"):
        if w % 2 or h % 2:
            raise Y4mError(f"C420 requires even dimensions, got {w}x{h}")
        return [(h, w), (h // 2, w // 2), (h // 2, w // 2)]
    if cspace.startswith("422"):
        if w % 2:
            raise Y4mError(f"C422 requires even width, got {w}")
        return [(h, w), (h, w // 2), (h, w // 2)]
    if cspace.startswith("444"):
        return [(h, w), (h, w), (h, w)]
    if cspace.startswith("mono"):
        return [(h, w)]
    raise Y4mError(f"unsupported colourspace C{cspace}")


def _upsample(plane, h: int, w: int):
    """Nearest-neighbour chroma upsampling to the luma grid."""
    ph, pw = plane.shape
    return plane[
        np.minimum(np.arange(h) * ph // h, ph - 1)[:, None],
        np.minimum(np.arange(w) * pw // w, pw - 1)[None, :],
    ]


class _FakePILImage:
    """Minimal PIL.Image-alike wrapper over an interleaved RGB (or grey)
    ndarray — just enough surface for frame.to_image().tobytes()."""

    def __init__(self, arr):
        self._arr = arr
        self.size = (arr.shape[1], arr.shape[0])
        self.mode = "RGB" if arr.ndim == 3 else "L"

    def tobytes(self) -> bytes:
        return self._arr.tobytes()


@dataclass
class VideoFrame:
    """One decoded frame: planar YUV kept as-is; to_image() converts."""

    index: int
    width: int
    height: int
    colourspace: str
    planes: list  # list of uint8 ndarrays

    def to_ndarray(self):
        """Interleaved RGB uint8 (h, w, 3), or (h, w) for mono."""
        if len(self.planes) == 1:
            return self.planes[0]
        y = self.planes[0].astype(np.float32)
        u = _upsample(self.planes[1], self.height, self.width).astype(np.float32) - 128.0
        v = _upsample(self.planes[2], self.height, self.width).astype(np.float32) - 128.0
        # BT.601 full-range (JFIF) inverse matrix
        r = y + 1.402 * v
        g = y - 0.344136 * u - 0.714136 * v
        b = y + 1.772 * u
        return np.clip(np.stack([r, g, b], axis=-1), 0.0, 255.0).round().astype(np.uint8)

    def to_image(self) -> _FakePILImage:
        return _FakePILImage(self.to_ndarray())


class Y4mContainer:
    """PyAV-container-alike over one Y4M stream. Frames parse lazily;
    the whole payload is already in memory (it arrived as a binary
    column value), so laziness here is about skipping the YUV->RGB
    conversion for frames the sampler drops, not about IO."""

    def __init__(self, data: bytes):
        if not data.startswith(_MAGIC):
            raise Y4mError("not a YUV4MPEG2 stream (missing magic)")
        nl = data.index(b"\n")
        header = data[len(_MAGIC) : nl].decode("ascii", "replace")
        self.width = self.height = 0
        self.framerate = (30, 1)
        self.colourspace = "420jpeg"  # spec default when C is absent
        for tok in header.split():
            if tok[0] == "W":
                self.width = int(tok[1:])
            elif tok[0] == "H":
                self.height = int(tok[1:])
            elif tok[0] == "F":
                num, _, den = tok[1:].partition(":")
                self.framerate = (int(num), int(den or 1))
            elif tok[0] == "C":
                self.colourspace = tok[1:]
            # Ip/A/X tokens carry no layout information — ignored
        if self.width <= 0 or self.height <= 0:
            raise Y4mError(f"bad dimensions in header: {header!r}")
        self._data = data
        self._body = nl + 1
        self._shapes = _plane_shapes(self.width, self.height, self.colourspace)
        self._frame_bytes = sum(h * w for h, w in self._shapes)

    # PyAV-surface parity: av containers are context managers
    def __enter__(self) -> "Y4mContainer":
        return self

    def __exit__(self, *exc) -> None:
        return None

    def decode(self, video: int = 0):
        if video != 0:
            raise Y4mError("Y4M streams carry exactly one video stream")
        pos, idx, data = self._body, 0, self._data
        while pos < len(data):
            nl = data.find(b"\n", pos)
            if nl < 0 or data[pos : pos + 5] != b"FRAME":
                raise Y4mError(f"expected FRAME marker at byte {pos}")
            pos = nl + 1
            end = pos + self._frame_bytes
            if end > len(data):
                raise Y4mError(f"truncated frame {idx}")
            planes, off = [], pos
            for h, w in self._shapes:
                planes.append(
                    np.frombuffer(data[off : off + h * w], dtype=np.uint8).reshape(h, w)
                )
                off += h * w
            yield VideoFrame(idx, self.width, self.height, self.colourspace, planes)
            pos, idx = end, idx + 1


def open(file) -> Y4mContainer:  # noqa: A001 - PyAV surface parity
    """av.open-alike: accepts bytes or a binary file-like."""
    data = file if isinstance(file, (bytes, bytearray)) else file.read()
    return Y4mContainer(bytes(data))


def encode_y4m(
    frames,
    framerate: tuple[int, int] = (30, 1),
    colourspace: str = "444",
) -> bytes:
    """Encode RGB (h, w, 3) or grey (h, w) uint8 ndarrays to a .y4m
    stream (test/synthesis helper; C444 avoids chroma loss, Cmono for
    grey). RGB -> YUV uses the same BT.601 full-range matrix decode
    inverts."""
    frames = list(frames)
    if not frames:
        raise Y4mError("need at least one frame")
    h, w = frames[0].shape[:2]
    mono = frames[0].ndim == 2
    cspace = "mono" if mono else colourspace
    if not mono and colourspace != "444":
        raise Y4mError("encoder writes C444 (or Cmono) only")
    out = io.BytesIO()
    out.write(
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
        % (w, h, framerate[0], framerate[1], cspace.encode())
    )
    for f in frames:
        if f.shape[:2] != (h, w) or (f.ndim == 2) != mono:
            raise Y4mError("all frames must share shape and mode")
        out.write(b"FRAME\n")
        if mono:
            out.write(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
            continue
        rgb = f.astype(np.float32)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        for plane in (y, u, v):
            out.write(np.clip(plane, 0.0, 255.0).round().astype(np.uint8).tobytes())
    return out.getvalue()
