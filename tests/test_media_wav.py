"""RIFF/WAV PCM16 codec pins: round trip (mono + stereo), unknown
chunk skipping with word alignment, loud rejection of non-PCM and
structural corruption."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fluvio_demo_apps_rust_spark.functions.media_wav import decode_wav, encode_wav


def test_round_trip_mono():
    s = np.array([-32768, -1, 0, 1, 32767, 12345], dtype=np.int16)
    out, sr = decode_wav(encode_wav(s, 16000))
    assert sr == 16000
    assert np.array_equal(out, s)


def test_round_trip_stereo():
    s = np.arange(-10, 10, dtype=np.int16).reshape(-1, 2)
    out, sr = decode_wav(encode_wav(s, 44100))
    assert sr == 44100
    assert out.shape == s.shape
    assert np.array_equal(out, s)


def test_unknown_chunks_skipped_word_aligned():
    """A LIST chunk with an ODD payload length sits between fmt and
    data; the reader must hop it using the spec's word alignment."""
    base = encode_wav(np.array([7, -7, 7], dtype=np.int16), 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    patched = base[:fmt_end] + extra + base[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    out, sr = decode_wav(patched)
    assert sr == 8000
    assert np.array_equal(out, np.array([7, -7, 7], dtype=np.int16))


def test_non_pcm_rejected():
    b = bytearray(encode_wav(np.zeros(4, dtype=np.int16), 8000))
    b[20] = 3  # audio format: IEEE float
    b = b[:4] + struct.pack("<I", len(b) - 8) + b[8:]
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(b))


def test_bad_riff_rejected():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    good = encode_wav(np.zeros(4, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="length"):
        decode_wav(good[:-2])  # truncated: declared RIFF size mismatches
