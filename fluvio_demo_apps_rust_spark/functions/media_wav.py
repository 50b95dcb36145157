"""From-scratch RIFF/WAV PCM16 codec — stdlib struct + numpy only.

The audio face of the real-media-decode work (see media_png.py): a
spec-valid writer (RIFF → fmt → data chunk layout any player opens)
and a chunk-walking reader for the training-corpus normal form
(PCM, 16-bit, mono/stereo, little-endian). Unknown chunks are skipped
by their declared length (the spec's extension mechanism — LIST/INFO
chunks etc.); structural corruption raises loudly.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 sample array (n,) mono or (n, ch) → WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        ch = 1
    elif samples.ndim == 2:
        ch = samples.shape[1]
    else:
        raise ValueError("samples must be (n,) or (n, channels)")
    payload = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * 2 * ch, 2 * ch, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples int16 (n,) or (n, ch), sample_rate).
    PCM16 only; anything else raises (loud, never a silent misread)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len != len(data) - 8:
        raise ValueError("RIFF length does not match file size")
    pos = 12
    sr = ch = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            afmt, ch, sr, _brate, _balign, bits = struct.unpack("<HHIIHH", body[:16])
            if afmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant (format={afmt} bits={bits}); "
                    "only PCM16"
                )
        elif tag == b"data":
            payload = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if sr is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    samples = np.frombuffer(payload, dtype="<i2")
    if ch > 1:
        samples = samples.reshape(-1, ch)
    return samples, sr
