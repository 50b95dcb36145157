"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is real — BinaryType columns, metadata
structs, Arrow-batched ``mapInPandas`` feature extraction with bounded
batch sizes. Media decode is REAL for PNG (round 6): the stdlib-only
codec in functions/media_png.py gives ``synth_png`` /
``decode_png_features`` / ``png_resize_features`` a genuine
encode→decode→resample→re-encode pipeline with zero external
dependencies, oracle-gated by closed-form pixel sums. Formats that
genuinely need external libraries keep the harness pair:
``decode_stub`` (deterministic fake features, same batch shape) and
``decode_real`` (PIL path, raises NotImplementedError in this
sandbox). Generalizes the reference's Blob value (values.rs:16 —
"TODO: add binary support").

Scale posture: blobs stay in executor memory one Arrow batch at a
time (cap via spark.sql.execution.arrow.maxRecordsPerBatch); feature
extraction is embarrassingly parallel; metadata-only queries never
deserialize the payload column (columnar pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "doc_id bigint, byte_len bigint, sha256 string, width int, height int, n_frames int"
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload: the UTF-8 bytes of the text as an opaque blob
    (stands in for image/audio bytes; plumbing is type-identical)."""
    return df.withColumn("blob", F.encode(F.col(text_col), "utf-8"))


def blob_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Typed metadata without decoding: length, digest, fake geometry
    derived deterministically from the byte length."""
    bl = F.octet_length(F.col(blob_col))
    return df.select(
        "doc_id",
        bl.cast("long").alias("byte_len"),
        F.sha2(F.col(blob_col), 256).alias("sha256"),
        (bl % 640).cast("int").alias("width"),
        ((bl * 7) % 480).cast("int").alias("height"),
        (bl % 16).cast("int").alias("n_frames"),
    )


def decode_stub(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Arrow-batched 'decode': deterministic fake features per blob.
    This is the exact harness a real decoder drops into — same
    signature, same batch shape, same schema contract."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": blobs.map(len),
                    "sha256": blobs.map(lambda b: __import__("hashlib").sha256(b).hexdigest()),
                    "width": blobs.map(lambda b: len(b) % 640),
                    "height": blobs.map(lambda b: (len(b) * 7) % 480),
                    "n_frames": blobs.map(lambda b: len(b) % 16),
                }
            )
            yield out

    return df.select("doc_id", blob_col).mapInPandas(extract, schema=MEDIA_META_SCHEMA)


def decode_real(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Real image decode via PIL, importable on demand: same harness
    (Arrow mapInPandas), same MEDIA_META_SCHEMA contract as
    decode_stub, but width/height/n_frames come from an actual decode.
    Raises NotImplementedError when PIL is absent (this sandbox);
    tests/test_llm_functions.py carries a skipif-marked test that
    exercises this path the day the environment has media libs."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decoding requires Pillow (PIL); not present in this "
            "environment — use decode_stub for the plumbing-equivalent path"
        ) from e

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io

        from PIL import Image

        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(b)
                with Image.open(io.BytesIO(b)) as im:
                    n_frames = int(getattr(im, "n_frames", 1))
                    rows.append(
                        (
                            doc_id,
                            len(b),
                            hashlib.sha256(b).hexdigest(),
                            im.width,
                            im.height,
                            n_frames,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "byte_len", "sha256", "width", "height", "n_frames",
                ],
            )

    return df.select("doc_id", blob_col).mapInPandas(extract, schema=MEDIA_META_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_sha string"


def frame_sample_stub(
    df: DataFrame,
    blob_col: str = "blob",
    frame_size: int = 64,
    max_frames: int = 16,
) -> DataFrame:
    """Frame sampling: one input blob → up to ``max_frames`` output
    rows (consecutive ``frame_size``-byte slices). This is the video
    frame-extraction harness: mapInPandas with a row-multiplying output
    — a real ffmpeg-based sampler drops into the same loop, replacing
    byte slicing with frame decode. Deterministic (byte-slice + sha256)
    so the DuckDB oracle can verify the fan-out exactly.
    """
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(b)
                n = min(max_frames, max(1, -(-len(b) // frame_size)))
                for i in range(n):
                    fr = b[i * frame_size : (i + 1) * frame_size]
                    # digest the lowercase-hex form (DuckDB's sha256
                    # takes VARCHAR only, so the oracle hashes hex too)
                    sha = hashlib.sha256(fr.hex().encode()).hexdigest()
                    rows.append((doc_id, i, len(fr), sha))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_len", "frame_sha"]
            )

    return df.select("doc_id", blob_col).mapInPandas(sample, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, resized binary, out_len int"


def resize_stub(df: DataFrame, blob_col: str = "blob", target_bytes: int = 64) -> DataFrame:
    """'Resize' harness: binary in → binary out through Arrow batches
    (truncate-or-zero-pad stands in for an image resample; a real
    PIL.Image.resize drops into the same loop). Proves the
    binary-payload round trip through mapInPandas."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                bytes(b)[:target_bytes].ljust(target_bytes, b"\x00")
                for b in pdf[blob_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": out,
                    "out_len": [len(b) for b in out],
                }
            )

    return df.select("doc_id", blob_col).mapInPandas(resize, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# REAL media decode (round 6): PNG needs nothing beyond stdlib zlib,
# so the decode step is no longer environment-stubbed for the
# training-corpus normal form (8-bit non-interlaced RGB). See
# functions/media_png.py for the from-scratch codec.

PNG_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, pixel_sum bigint, byte_len bigint"
)


def synth_png(df: DataFrame) -> DataFrame:
    """Deterministic REAL PNG per document: width/height derive from
    doc_id and pixel i is (doc_id*31 + i) % 256 — closed forms a SQL
    oracle can recompute, while the bytes themselves are spec-valid
    PNG (CRC'd chunks, DEFLATE IDAT) any external decoder opens."""
    import numpy as np

    from .media_png import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = d % 24 + 8, d % 16 + 8
                arr = (
                    (d * 31 + np.arange(h * w * 3)) % 256
                ).astype(np.uint8).reshape(h, w, 3)
                blobs.append(encode_png(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    # testdata parquet is ONE row group per file — repartition before
    # the per-row-heavy codec chain so encode/decode parallelize
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select("doc_id")
        .repartition(par, "doc_id")
        .mapInPandas(gen, schema="doc_id bigint, blob binary")
    )


def decode_png_features(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """REAL decode: chunk walk, IHDR, IDAT inflate, unfilter — then
    emit geometry + the exact pixel sum (BIGINT; no floats)."""
    from .media_png import decode_png_auto

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                arr = decode_png_auto(bytes(b))
                rows.append(
                    (
                        int(doc_id),
                        arr.shape[1],
                        arr.shape[0],
                        int(arr.sum(dtype="int64")),
                        len(bytes(b)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "pixel_sum", "byte_len"]
            )
            rows = []

    return df.select("doc_id", blob_col).mapInPandas(
        extract, schema=PNG_FEATURES_SCHEMA
    )


def png_resize_features(
    df: DataFrame, blob_col: str = "blob", out_w: int = 16, out_h: int = 16
) -> DataFrame:
    """Decode → nearest-neighbor resample → RE-ENCODE → decode again,
    emitting the resized pixel sum: the full codec round trip inside
    one Arrow batch loop, with the output verifiable from the
    source-index closed form ((y*h) DIV out_h, (x*w) DIV out_w)."""
    from .media_png import decode_png_auto, encode_png, resize_nn

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                small = resize_nn(decode_png_auto(bytes(b)), out_w, out_h)
                again = decode_png_auto(encode_png(small))
                rows.append(
                    (int(doc_id), out_w, out_h, int(again.sum(dtype="int64")))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_w", "out_h", "resized_sum"]
            )
            rows = []

    return df.select("doc_id", blob_col).mapInPandas(
        work, schema="doc_id bigint, out_w int, out_h int, resized_sum bigint"
    )


WAV_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples bigint, sample_rate int, sum_samples bigint, energy bigint"
)


def synth_wav(df: DataFrame) -> DataFrame:
    """Deterministic REAL WAV per document (PCM16 mono): n and the
    sample generator are closed forms of doc_id the oracle recomputes;
    the bytes are spec-valid RIFF any player opens."""
    import numpy as np

    from .media_wav import encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 512 + 64
                sr = 8000 + (d % 8) * 1000
                s = (((d * 7 + np.arange(n) * 13) % 65536) - 32768).astype(np.int16)
                blobs.append(encode_wav(s, sr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select("doc_id")
        .repartition(par, "doc_id")
        .mapInPandas(gen, schema="doc_id bigint, blob binary")
    )


def decode_wav_features(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """REAL RIFF parse + PCM16 decode → exact integer audio features
    (count, rate, amplitude sum, energy = sum of squares)."""
    import numpy as np

    from .media_wav import decode_wav

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                s, sr = decode_wav(bytes(b))
                s64 = s.astype(np.int64)
                rows.append(
                    (int(doc_id), len(s), sr, int(s64.sum()), int((s64 * s64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "sum_samples", "energy"],
            )

    return df.select("doc_id", blob_col).mapInPandas(
        extract, schema=WAV_FEATURES_SCHEMA
    )


# --- simple video container: b"FVID" + u32 n_frames, then per frame
# u32 byte length + a REAL PNG payload. Container walk + per-frame
# image decode is the actual video-frame-extraction shape (an ffmpeg
# demuxer drops into the same loop).

VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_w int, frame_h int, frame_pixel_sum bigint"
)


def synth_video(df: DataFrame) -> DataFrame:
    """doc_id % 4 + 2 frames of 8x8 RGB; frame k pixel i is
    (doc_id*31 + k*77 + i) % 256 — closed forms for the oracle."""
    import struct as _struct

    import numpy as np

    from .media_png import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = d % 4 + 2
                frames = []
                for f in range(k):
                    arr = (
                        (d * 31 + f * 77 + np.arange(8 * 8 * 3)) % 256
                    ).astype(np.uint8).reshape(8, 8, 3)
                    frames.append(encode_png(arr))
                blob = b"FVID" + _struct.pack("<I", k) + b"".join(
                    _struct.pack("<I", len(p)) + p for p in frames
                )
                blobs.append(blob)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select("doc_id")
        .repartition(par, "doc_id")
        .mapInPandas(gen, schema="doc_id bigint, blob binary")
    )


def video_frame_features(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Walk the container, REALLY decode every PNG frame, emit one row
    per frame — the row-multiplying frame-sample harness with an
    actual image decode inside."""
    import struct as _struct

    from .media_png import decode_png_auto

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(b)
                if b[:4] != b"FVID":
                    raise ValueError("not an FVID container")
                (k,) = _struct.unpack("<I", b[4:8])
                pos = 8
                for f in range(k):
                    (ln,) = _struct.unpack("<I", b[pos : pos + 4])
                    arr = decode_png_auto(b[pos + 4 : pos + 4 + ln])
                    rows.append(
                        (
                            int(doc_id),
                            f,
                            arr.shape[1],
                            arr.shape[0],
                            int(arr.sum(dtype="int64")),
                        )
                    )
                    pos += 4 + ln
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "frame_w", "frame_h", "frame_pixel_sum",
                ],
            )

    return df.select("doc_id", blob_col).mapInPandas(
        extract, schema=VIDEO_FRAME_SCHEMA
    )


def ahash_features(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Perceptual average-hash (aHash) per image — the imagededup-style
    near-dup key: REAL decode, nearest-neighbor resample to 8x8,
    integer grayscale ((r+g+b) DIV 3), threshold each cell against the
    integer mean ((sum of 64 grays) DIV 64), emit the 64 bits row-major
    as a '0'/'1' string (string, not BIGINT, so bit 63 can never
    overflow signed 64-bit on either engine). All-integer arithmetic —
    a SQL oracle walking the closed-form pixel generator reproduces the
    hash bit for bit."""
    import numpy as np

    from .media_png import decode_png_auto, resize_nn

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                small = resize_nn(decode_png_auto(bytes(b)), 8, 8).astype(np.int64)
                gray = small.sum(axis=2) // 3  # (8, 8) ints
                m = int(gray.sum()) // 64
                bits = "".join(
                    "1" if int(v) > m else "0" for v in gray.reshape(-1)
                )
                rows.append((int(doc_id), bits, m))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash", "gray_mean"])
            rows = []

    return df.select("doc_id", blob_col).mapInPandas(
        work, schema="doc_id bigint, ahash string, gray_mean bigint"
    )


AUDIO_FP_FRAME = 64  # samples per fingerprint frame


def audio_fingerprint_features(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Audio fingerprint (chromaprint-style, integer form): REAL WAV
    decode, frame the PCM16 stream into 64-sample frames (tail partial
    frame dropped), exact per-frame energy (sum of squares, BIGINT),
    then one bit per frame transition — energy rising vs previous
    frame. The '0'/'1' string is the dedup/retrieval key for the audio
    modality (the same role aHash plays for images). All-integer, so a
    SQL oracle recomputes it from the sample generator closed forms."""
    import numpy as np

    from .media_wav import decode_wav

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                s, _sr = decode_wav(bytes(b))
                s64 = s.astype(np.int64)
                nf = len(s64) // AUDIO_FP_FRAME
                frames = s64[: nf * AUDIO_FP_FRAME].reshape(nf, AUDIO_FP_FRAME)
                e = (frames * frames).sum(axis=1)
                bits = "".join(
                    "1" if int(e[i]) > int(e[i - 1]) else "0" for i in range(1, nf)
                )
                rows.append((int(doc_id), nf, bits))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "audio_fp"])
            rows = []

    return df.select("doc_id", blob_col).mapInPandas(
        work, schema="doc_id bigint, n_frames bigint, audio_fp string"
    )


def video_phash_features(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Video perceptual hash: walk the FVID container, REALLY decode
    every PNG frame, compute the per-frame average-hash bit string
    (frames are already 8x8 — integer grayscale, mean threshold), and
    digest the '|'-joined frame-hash sequence with md5 — the
    temporal-order-sensitive near-dup key for the video modality.
    All-integer per frame, so the SQL oracle rebuilds the identical
    digest from the frame-pixel generator closed forms."""
    import hashlib as _hashlib
    import struct as _struct

    import numpy as np

    from .media_png import decode_png_auto

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id, b in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(b)
                if b[:4] != b"FVID":
                    raise ValueError("not an FVID container")
                (k,) = _struct.unpack("<I", b[4:8])
                pos = 8
                fbs = []
                for _f in range(k):
                    (ln,) = _struct.unpack("<I", b[pos : pos + 4])
                    arr = decode_png_auto(b[pos + 4 : pos + 4 + ln]).astype(np.int64)
                    gray = arr.sum(axis=2) // 3
                    m = int(gray.sum()) // (gray.shape[0] * gray.shape[1])
                    fbs.append(
                        "".join("1" if int(v) > m else "0" for v in gray.reshape(-1))
                    )
                    pos += 4 + ln
                digest = _hashlib.md5("|".join(fbs).encode()).hexdigest()
                rows.append((int(doc_id), k, digest))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "video_phash"])
            rows = []

    return df.select("doc_id", blob_col).mapInPandas(
        work, schema="doc_id bigint, n_frames bigint, video_phash string"
    )
