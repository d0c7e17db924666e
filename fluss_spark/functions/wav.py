"""Minimal pure-stdlib WAV codec (PCM16 mono) — the audio analog of
functions/png.py: gives `decode_mode="real"` an executable path for one
real format in every environment (the stdlib `wave` module does the
container framing; samples are little-endian int16). Scope is
deliberately narrow — mono PCM16 only; a full codec (soundfile), when
installed, takes precedence in the probe."""

from __future__ import annotations

import io
import struct
import wave

# marks this module as the narrow-scope fallback in codec probes
# (decode_mode="auto" must not upgrade to a codec that rejects
# arbitrary payloads)
IS_FALLBACK = True


def encode(samples: list[int], rate: int) -> bytes:
    """PCM16 mono WAV bytes from int samples (each in [-32768, 32767])."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack("<%dh" % len(samples), *samples))
    return buf.getvalue()


def decode(b: bytes) -> tuple[list[int], int]:
    """(samples, sample_rate) from PCM16 mono WAV bytes."""
    with wave.open(io.BytesIO(b), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                "wav fallback codec handles PCM16 mono only "
                f"(got {w.getnchannels()} ch, {w.getsampwidth() * 8}-bit)"
            )
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    return list(struct.unpack("<%dh" % (len(raw) // 2), raw)), rate
