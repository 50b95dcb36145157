"""From-scratch PNG codec pins: spec-valid round trip, independent
re-filtering for all five scanline filter types, loud rejection of
corrupt/unsupported input, and the deterministic resample map."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fluvio_demo_apps_rust_spark.functions.media_png import (
    _chunk,
    decode_png,
    encode_png,
    resize_nn,
)


def _rand(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_round_trip_exact():
    arr = _rand(13, 17, 0)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_one_pixel_and_wide_shapes():
    for h, w in [(1, 1), (1, 64), (64, 1), (2, 3)]:
        arr = _rand(h, w, h * 100 + w)
        assert decode_png(encode_png(arr)).shape == (h, w, 3)
        assert np.array_equal(decode_png(encode_png(arr)), arr)


def _encode_with_filters(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Independent filtering implementation (spec definitions written
    from the filter equations, not from the decoder's inverse) so the
    decoder's unfilter is cross-checked, not round-tripped."""
    h, w, _ = arr.shape
    stride = w * 3
    flat = arr.reshape(h, stride).astype(int)
    prev = np.zeros(stride, dtype=int)
    raw = bytearray()
    for y in range(h):
        line, ft = flat[y], ftypes[y % len(ftypes)]
        f = np.zeros(stride, dtype=int)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            f[i] = (line[i] - pred) % 256
        raw += bytes([ft]) + bytes(f.astype(np.uint8))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_unfilter_all_types(ftypes):
    arr = _rand(11, 7, sum(ftypes) + 7)
    assert np.array_equal(decode_png(_encode_with_filters(arr, ftypes)), arr)


def test_corrupt_crc_rejected():
    b = bytearray(encode_png(_rand(4, 4, 1)))
    b[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(b))


def test_unsupported_variant_rejected():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0)  # RGBA
    data = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(data)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + b"\x00" * 32)


def test_resize_nn_matches_index_formula():
    arr = _rand(10, 14, 3)
    out = resize_nn(arr, 5, 6)
    assert out.shape == (6, 5, 3)
    for y in range(6):
        for x in range(5):
            assert np.array_equal(out[y, x], arr[(y * 10) // 6, (x * 14) // 5])


def test_ahash_bits_match_brute_force():
    """ahash_features' integer pipeline (decode -> 8x8 NN resample ->
    (r+g+b) DIV 3 -> mean threshold) against an independent recompute
    straight from the generator closed forms."""
    import numpy as np

    from fluvio_demo_apps_rust_spark.functions.media_png import (
        decode_png,
        encode_png,
        resize_nn,
    )

    for d in (0, 7, 123, 767):
        w, h = d % 24 + 8, d % 16 + 8
        arr = ((d * 31 + np.arange(h * w * 3)) % 256).astype(np.uint8).reshape(h, w, 3)
        # the harness path
        small = resize_nn(decode_png(encode_png(arr)), 8, 8).astype(np.int64)
        gray = small.sum(axis=2) // 3
        m = int(gray.sum()) // 64
        got = "".join("1" if int(v) > m else "0" for v in gray.reshape(-1))
        # closed-form recompute (the oracle's arithmetic)
        bits = []
        grays = []
        for y in range(8):
            for x in range(8):
                base = ((y * h) // 8 * w + (x * w) // 8) * 3
                g = sum((d * 31 + base + c) % 256 for c in range(3)) // 3
                grays.append(g)
        mm = sum(grays) // 64
        exp = "".join("1" if g > mm else "0" for g in grays)
        assert got == exp and m == mm, d


# ---------------------------------------------------------------------------
# Native-vs-stdlib decoder parity (capability-gated: skips without PIL)
# ---------------------------------------------------------------------------

try:
    import PIL  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def test_decode_png_auto_falls_back_without_pil():
    from fluvio_demo_apps_rust_spark.functions import media_png as mp

    arr = _rand(9, 13, 42)
    got = mp.decode_png_auto(mp.encode_png(arr))
    assert (got == arr).all()
    if not _HAS_PIL:
        assert mp._HAS_PIL is False  # fallback path actually exercised


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed in sandbox")
def test_native_decode_matches_stdlib_codec():
    """PIL and the stdlib codec must return the IDENTICAL pixel array
    in both directions: PIL decoding our encoder's bytes, and our
    decoder reading PIL's bytes — the guarantee that lets
    decode_png_auto swap decoders by capability with zero effect on
    any oracle-gated feature downstream."""
    import io

    from PIL import Image

    from fluvio_demo_apps_rust_spark.functions.media_png import (
        decode_png,
        decode_png_auto,
        encode_png,
    )

    for seed, (h, w) in ((1, (9, 13)), (2, (1, 1)), (3, (16, 300))):
        arr = _rand(h, w, seed)
        ours = encode_png(arr)
        # direction 1: native decode of stdlib-encoded bytes
        with Image.open(io.BytesIO(ours)) as im:
            assert (np.asarray(im.convert("RGB")) == arr).all()
        assert (decode_png_auto(ours) == arr).all()
        # direction 2: stdlib decode of native-encoded bytes
        buf = io.BytesIO()
        Image.fromarray(arr, "RGB").save(buf, format="PNG")
        assert (decode_png(buf.getvalue()) == arr).all()


# --- r8: magic-byte sniff dispatch (mixed-format corpora) -----------------


def test_sniff_image_format():
    from fluvio_demo_apps_rust_spark.functions.media_png import (
        encode_png,
        sniff_image_format,
    )

    png = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    assert sniff_image_format(png) == "png"
    assert sniff_image_format(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpeg"
    assert sniff_image_format(b"RIFF\x10\x00\x00\x00WEBPVP8 ") == "webp"
    assert sniff_image_format(b"GIF89a" + b"\x00" * 8) == "gif"
    assert sniff_image_format(b"GIF87a" + b"\x00" * 8) == "gif"
    assert sniff_image_format(b"\x00\x01\x02\x03\x04\x05\x06\x07") == "unknown"
    assert sniff_image_format(b"") == "unknown"


@pytest.mark.skipif(_HAS_PIL, reason="stdlib-only reject path needs no PIL")
def test_non_png_rejected_loudly_without_pil():
    """A JPEG blob must raise the FORMAT-NAMING error, not 'bad PNG
    signature' — a mixed corpus never silently assumes PNG."""
    from fluvio_demo_apps_rust_spark.functions.media_png import (
        UnsupportedImageFormatError,
        decode_png_auto,
    )

    jpeg_header = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01" + b"\x00" * 32
    with pytest.raises(UnsupportedImageFormatError, match="jpeg"):
        decode_png_auto(jpeg_header)
    with pytest.raises(UnsupportedImageFormatError, match="webp"):
        decode_png_auto(b"RIFF\x10\x00\x00\x00WEBPVP8 " + b"\x00" * 8)


def test_unknown_magic_rejected_either_way():
    from fluvio_demo_apps_rust_spark.functions.media_png import decode_png_auto

    with pytest.raises(ValueError, match="magic"):
        decode_png_auto(b"\x00\x01\x02\x03\x04\x05\x06\x07\x08")


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed in sandbox")
def test_jpeg_decodes_via_pil_dispatch():
    """With PIL present, a real JPEG round-trips through the same
    decode_png_auto entry point a mixed corpus would hit."""
    import io

    from PIL import Image

    from fluvio_demo_apps_rust_spark.functions.media_png import decode_png_auto

    arr = (np.indices((16, 16)).sum(axis=0) % 256).astype(np.uint8)
    rgb = np.stack([arr, arr, arr], axis=-1)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=95)
    out = decode_png_auto(buf.getvalue())
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    # JPEG is lossy: assert closeness, not identity
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 8


def test_mixed_corpus_rejects_loudly_through_arrow_harness(spark):
    """The sniff dispatch must surface through the mapInPandas harness:
    a JPEG blob in a PNG-decode pipeline fails the JOB with the
    format-naming error (PIL absent) or decodes (PIL present) — it is
    never silently skipped or nulled."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from fluvio_demo_apps_rust_spark.functions.media_png import encode_png
    from fluvio_demo_apps_rust_spark.functions.multimodal import decode_png_features

    png = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    jpeg_header = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01" + b"\x00" * 32
    df = spark.createDataFrame(
        [(0, bytearray(png)), (1, bytearray(jpeg_header))], "doc_id long, blob binary"
    )
    out = decode_png_features(df)
    if _HAS_PIL:
        # dispatch would hand the JPEG to PIL; truncated header still
        # errors — either way the job must not silently drop the row
        with pytest.raises((PythonException, Py4JJavaError)):
            out.collect()
    else:
        with pytest.raises((PythonException, Py4JJavaError), match="jpeg"):
            out.collect()
