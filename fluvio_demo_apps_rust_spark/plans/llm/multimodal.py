"""Multimodal family: REAL PNG/WAV/FVID codecs behind Arrow harnesses, perceptual keys (aHash, audio fingerprint, video phash) and their pair joins.

Split from plans/llm.py (r10 verdict #5); registration order across
the split is irrelevant — plans/__init__ orders the driver-visible
enumeration by canonical_order.ORDER.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401

from ...functions import curation as C  # noqa: F401
from ...functions import dedup as X  # noqa: F401
from ...functions import multimodal as M  # noqa: F401
from ...functions import similarity as S  # noqa: F401
from ...functions import text as TX  # noqa: F401
from ...functions import web as W  # noqa: F401
from ..base import REGISTRY as _REGISTRY  # noqa: F401  (same-package oracle reuse)
from ..base import fround, load, register  # noqa: F401
from .common import _media_rel  # noqa: F401



@register(
    "llm_multimodal_frames",
    tags=("llm", "multimodal"),
    oracle="""
WITH f AS (SELECT doc_id, lower(hex(encode(text))) AS hx FROM documents),
idx AS (
  SELECT doc_id, hx,
         unnest(generate_series(0,
           greatest(least(15, CAST(ceil((length(hx) / 2) / 64.0) AS INT) - 1), 0)
         )) AS frame_idx
  FROM f)
SELECT doc_id, frame_idx::INT AS frame_idx,
       (length(substr(hx, frame_idx * 128 + 1, 128)) / 2)::INT AS frame_len,
       sha256(substr(hx, frame_idx * 128 + 1, 128)) AS frame_sha
FROM idx
""",
)
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the mapInPandas harness: blob → ≤16
    64-byte frames, row-multiplying Arrow batches (the video-decode
    plumbing, byte-slice stand-in)."""
    d = M.attach_blob(load(spark, sf_dir, "documents"))
    return M.frame_sample_stub(d)


@register(
    "llm_multimodal_meta",
    tags=("llm", "multimodal"),
    oracle="""
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS byte_len,
       sha256(text) AS sha256,
       (octet_length(encode(text)) % 640)::INT AS width,
       ((octet_length(encode(text)) * 7) % 480)::INT AS height,
       (octet_length(encode(text)) % 16)::INT AS n_frames
FROM documents
""",
)
def llm_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob metadata without decode (columnar pruning keeps the
    payload unread for metadata-only queries)."""
    d = M.attach_blob(load(spark, sf_dir, "documents"))
    return M.blob_meta(d)


@register(
    "llm_multimodal_resize",
    tags=("llm", "multimodal"),
    oracle="""
WITH f AS (SELECT doc_id, lower(hex(encode(text))) AS hx FROM documents)
SELECT doc_id,
       64 AS out_len,
       sha256(rpad(substr(hx, 1, 128), 128, '0')) AS resized_sha
FROM f
""",
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-in → binary-out resize plumbing through Arrow batches
    (truncate-or-pad stands in for an image resample; a real
    PIL.Image.resize drops into the same mapInPandas loop). The result
    is verified via the sha of the resized payload's hex form —
    proving the binary payload survives the Arrow round trip intact."""
    d = M.attach_blob(load(spark, sf_dir, "documents"))
    r = M.resize_stub(d, target_bytes=64)
    return r.select(
        "doc_id",
        F.col("out_len").cast("int").alias("out_len"),
        F.sha2(F.lower(F.hex("resized")), 256).alias("resized_sha"),
    )


@register(
    "llm_png_decode",
    tags=("llm", "multimodal", "codec"),
    oracle="""
-- The Spark side REALLY encodes then decodes a PNG per document
-- (from-scratch stdlib codec: DEFLATE IDAT, CRC'd chunks, scanline
-- unfilter). The oracle recomputes the closed forms the pixels were
-- generated from: pixel i = (doc_id*31 + i) % 256 over n = w*h*3
-- values sums to full-cycles*32640 + a wrapped arithmetic series.
WITH d AS (SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h FROM documents),
p AS (SELECT doc_id, w, h, w * h * 3 AS n, (doc_id * 31) % 256 AS s FROM d)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST((n // 256) * 32640 +
            CASE WHEN s + (n % 256) <= 256
                 THEN (n % 256) * s + ((n % 256) * ((n % 256) - 1)) // 2
                 ELSE ((256 - s) * (s + 255)) // 2
                      + (((n % 256) - 256 + s) * ((n % 256) - 256 + s - 1)) // 2
            END AS BIGINT) AS pixel_sum
FROM p
""",
)
def llm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, no external libs (r5's one environment-
    blocked row closed): per document, synthesize a spec-valid RGB8
    PNG (functions/media_png.encode_png — zlib DEFLATE, CRC32 chunks)
    whose dimensions and pixels are closed forms of doc_id, then
    DECODE it back (chunk walk, IHDR, IDAT inflate, all-five-filter
    unfilter) inside the same Arrow mapInPandas harness the stub used,
    emitting geometry + the exact BIGINT pixel sum. The oracle knows
    nothing about PNG — it recomputes the closed forms, so a codec bug
    anywhere (encode, compress, decode, unfilter) breaks the hash.

    Scale posture: blobs live one Arrow batch at a time; decode is
    embarrassingly parallel per row; no shuffle at all."""
    from ...functions.multimodal import decode_png_features, synth_png

    d = load(spark, sf_dir, "documents")
    return decode_png_features(synth_png(d)).select(
        "doc_id", "width", "height", "pixel_sum"
    )


@register(
    "llm_png_resize",
    tags=("llm", "multimodal", "codec"),
    oracle="""
-- Nearest-neighbor source index: ((y*h) DIV 16, (x*w) DIV 16); the
-- oracle walks the 16x16x3 output grid per document and sums the
-- generator values at the mapped source offsets.
WITH d AS (SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h FROM documents)
SELECT doc_id,
       CAST(16 AS INT) AS out_w,
       CAST(16 AS INT) AS out_h,
       CAST(sum((doc_id * 31
                 + ((((y.range * h) // 16) * w + ((x.range * w) // 16)) * 3
                    + c.range)) % 256) AS BIGINT) AS resized_sum
FROM d, range(16) y, range(16) x, range(3) c
GROUP BY doc_id
""",
)
def llm_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resample round trip: decode the synthesized PNG, nearest-
    neighbor resample to 16x16 (both up- and down-scaling occur — the
    source is 8..31 x 8..23), RE-ENCODE the small image, decode it
    AGAIN, and emit the resized pixel sum. Four codec passes per row;
    the oracle recomputes the resample's integer index map directly,
    so the whole encode→decode→resize→encode→decode chain must be
    lossless and index-exact to hash-match."""
    from ...functions.multimodal import png_resize_features, synth_png

    d = load(spark, sf_dir, "documents")
    return png_resize_features(synth_png(d))


@register(
    "llm_wav_decode",
    tags=("llm", "multimodal", "codec", "audio"),
    oracle="""
-- Spark really writes then parses a RIFF/WAV PCM16 file per document
-- (functions/media_wav.py); the oracle recomputes the sample
-- generator s_i = (doc_id*7 + 13i) % 65536 - 32768 over the range.
WITH d AS (SELECT doc_id, doc_id % 512 + 64 AS n,
                  8000 + (doc_id % 8) * 1000 AS sr FROM documents)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(sr AS INT) AS sample_rate,
       CAST(sum(((doc_id * 7 + r.range * 13) % 65536) - 32768) AS BIGINT) AS sum_samples,
       CAST(sum((((doc_id * 7 + r.range * 13) % 65536) - 32768)
                * (((doc_id * 7 + r.range * 13) % 65536) - 32768)) AS BIGINT) AS energy
FROM d, range(576) r
WHERE r.range < n
GROUP BY doc_id, n, sr
""",
)
def llm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, stdlib only: synthesize a spec-valid
    RIFF/WAV PCM16 file per document (sample count, rate, and every
    sample are closed forms of doc_id), parse it back with the
    from-scratch chunk walker, and emit exact integer audio features
    (count / rate / amplitude sum / energy = Σ s² — all BIGINT, no
    floats). A writer or reader bug anywhere breaks the hash."""
    from ...functions.multimodal import decode_wav_features, synth_wav

    d = load(spark, sf_dir, "documents")
    return decode_wav_features(synth_wav(d))


@register(
    "llm_video_frames",
    tags=("llm", "multimodal", "codec", "video"),
    oracle="""
-- Container walk + per-frame REAL PNG decode: doc_id %% 4 + 2 frames
-- of 8x8 RGB; frame k's pixels start at s = (doc_id*31 + 77k) %% 256
-- and the 192-value wrapped arithmetic series has a closed form.
WITH d AS (SELECT doc_id, doc_id % 4 + 2 AS k FROM documents),
fr AS (SELECT doc_id, r.range AS f, ((doc_id * 31 + r.range * 77) % 256) AS s
       FROM d, range(5) r WHERE r.range < k)
SELECT doc_id,
       CAST(f AS INT) AS frame_idx,
       CAST(8 AS INT) AS frame_w,
       CAST(8 AS INT) AS frame_h,
       CAST(CASE WHEN s + 192 <= 256 THEN 192 * s + (192 * 191) // 2
                 ELSE ((256 - s) * (s + 255)) // 2
                      + ((192 - 256 + s) * (192 - 256 + s - 1)) // 2
            END AS BIGINT) AS frame_pixel_sum
FROM fr
""",
)
def llm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-frame extraction: each document carries a simple
    length-prefixed container (FVID header + per-frame u32 length +
    an actual PNG payload); the extractor walks the container and
    REALLY decodes every frame inside the row-multiplying mapInPandas
    harness — the shape an ffmpeg demuxer drops into. One output row
    per frame, pixel sums gated against the generator closed form."""
    from ...functions.multimodal import synth_video, video_frame_features

    d = load(spark, sf_dir, "documents")
    return video_frame_features(synth_video(d))


@register(
    "llm_image_ahash",
    tags=("llm", "multimodal", "dedup", "perceptual"),
    oracle="""
-- The Spark side really encodes a PNG per document, decodes it,
-- resamples to 8x8, grayscales, and thresholds against the mean
-- (functions/multimodal.ahash_features). The oracle knows nothing
-- about PNG: it recomputes the generator value at each nearest-
-- neighbor source index ((y*h) DIV 8, (x*w) DIV 8), grayscales the
-- three consecutive generator values, and rebuilds the same 64-bit
-- string. A codec, resample, or threshold bug anywhere flips bits.
WITH d AS (SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h FROM documents),
g AS (
  SELECT doc_id, y.range AS y, x.range AS x,
         ((doc_id * 31 + (((y.range * h) // 8) * w + ((x.range * w) // 8)) * 3) % 256
          + (doc_id * 31 + (((y.range * h) // 8) * w + ((x.range * w) // 8)) * 3 + 1) % 256
          + (doc_id * 31 + (((y.range * h) // 8) * w + ((x.range * w) // 8)) * 3 + 2) % 256
         ) // 3 AS gray
  FROM d, range(8) y, range(8) x),
m AS (SELECT doc_id, CAST(sum(gray) AS BIGINT) // 64 AS gray_mean FROM g GROUP BY doc_id),
hsh AS (
  SELECT g.doc_id,
         string_agg(CASE WHEN g.gray > m.gray_mean THEN '1' ELSE '0' END,
                    '' ORDER BY g.y, g.x) AS ahash,
         CAST(any_value(m.gray_mean) AS BIGINT) AS gray_mean
  FROM g JOIN m ON m.doc_id = g.doc_id
  GROUP BY g.doc_id)
SELECT doc_id, ahash, gray_mean,
       CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS cluster_n
FROM hsh
""",
)
def llm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup (average-hash): the image-modality
    member of the dedup family — synthesize a spec-valid PNG per
    document (closed-form pixels), REAL-decode it, 8x8 nearest-
    neighbor resample, integer grayscale, threshold against the mean,
    and key docs by the 64-bit hash; ``cluster_n`` counts hash-mates
    (the generator's dimension/phase period makes true perceptual
    clusters appear once the corpus outgrows it). This is the standard
    pre-training image-dedup key (imagededup/aHash) with every step
    exact-integer so the hash gate is bit-for-bit.

    Scale posture: decode/hash is embarrassingly parallel Arrow
    mapInPandas (blobs never shuffle); the only shuffle is the 64-char
    hash key for cluster counting — the same one-key-shuffle shape as
    exact dedup. At 100 TB the hash is the shard key; the window is
    partitioned by it (never global). The decoded key table is the
    shared session-cached relation (see _media_rel)."""
    hashed = _media_rel(spark, sf_dir, "ahash")
    w = Window.partitionBy("ahash")
    return hashed.select(
        "doc_id",
        "ahash",
        "gray_mean",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_n"),
    )


@register(
    "llm_audio_fingerprint",
    tags=("llm", "multimodal", "dedup", "audio", "fingerprint"),
    oracle="""
-- The Spark side really writes then parses RIFF/WAV PCM16 and frames
-- the samples (functions/multimodal.audio_fingerprint_features). The
-- oracle recomputes per-frame energies straight from the sample
-- generator s_i = (doc_id*7 + 13i) % 65536 - 32768, then the same
-- rising-energy transition bits.
WITH d AS (SELECT doc_id, doc_id % 512 + 64 AS n FROM documents),
fr AS (SELECT doc_id, n // 64 AS nf FROM d),
e AS (
  SELECT f.doc_id, fnum.range AS f_idx,
         CAST(sum(((f.doc_id * 7 + (fnum.range * 64 + i.range) * 13) % 65536 - 32768)
                * ((f.doc_id * 7 + (fnum.range * 64 + i.range) * 13) % 65536 - 32768))
              AS BIGINT) AS energy
  FROM fr f, range(9) fnum, range(64) i
  WHERE fnum.range < f.nf
  GROUP BY f.doc_id, fnum.range),
b AS (
  SELECT doc_id, f_idx,
         CASE WHEN energy > lag(energy) OVER (PARTITION BY doc_id ORDER BY f_idx)
              THEN '1' ELSE '0' END AS bit
  FROM e),
fp AS (
  SELECT doc_id,
         COALESCE(string_agg(bit, '' ORDER BY f_idx) FILTER (WHERE f_idx >= 1), '')
           AS audio_fp
  FROM b GROUP BY doc_id)
SELECT d2.doc_id, CAST((d2.doc_id % 512 + 64) // 64 AS BIGINT) AS n_frames, fp.audio_fp
FROM documents d2 JOIN fp ON fp.doc_id = d2.doc_id
""",
)
def llm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality dedup/retrieval key: synthesize a spec-valid
    PCM16 WAV per document (closed-form samples), REAL-decode it,
    frame into 64-sample windows, exact integer per-frame energy, one
    rising-energy bit per transition — the integer skeleton of a
    chromaprint-style acoustic fingerprint, completing the modality
    set (text: winnow; image: aHash; audio: this).

    Scale posture: decode + framing is embarrassingly parallel Arrow
    mapInPandas; no shuffle at all (the fingerprint is emitted
    per-row). A codec or framing bug anywhere flips bits against the
    closed-form oracle."""
    from ...functions.multimodal import audio_fingerprint_features, synth_wav

    d = load(spark, sf_dir, "documents")
    return audio_fingerprint_features(synth_wav(d))


@register(
    "llm_video_phash",
    tags=("llm", "multimodal", "dedup", "video", "perceptual"),
    oracle="""
-- The Spark side walks the FVID container and really PNG-decodes
-- every frame (functions/multimodal.video_phash_features). The oracle
-- rebuilds each frame's average-hash bits from the frame-pixel
-- generator (doc_id*31 + f*77 + i) % 256 over the 8x8x3 grid and
-- md5-digests the same '|'-joined sequence.
WITH d AS (SELECT doc_id, doc_id % 4 + 2 AS k FROM documents),
g AS (
  SELECT d.doc_id, f.range AS f_idx, p.range AS p_idx,
         ((d.doc_id * 31 + f.range * 77 + p.range * 3) % 256
          + (d.doc_id * 31 + f.range * 77 + p.range * 3 + 1) % 256
          + (d.doc_id * 31 + f.range * 77 + p.range * 3 + 2) % 256) // 3 AS gray
  FROM d, range(6) f, range(64) p
  WHERE f.range < d.k),
m AS (
  SELECT doc_id, f_idx, CAST(sum(gray) AS BIGINT) // 64 AS gm
  FROM g GROUP BY doc_id, f_idx),
bits AS (
  SELECT g.doc_id, g.f_idx,
         string_agg(CASE WHEN g.gray > m.gm THEN '1' ELSE '0' END,
                    '' ORDER BY g.p_idx) AS fb
  FROM g JOIN m ON m.doc_id = g.doc_id AND m.f_idx = g.f_idx
  GROUP BY g.doc_id, g.f_idx),
ph AS (
  SELECT doc_id, md5(string_agg(fb, '|' ORDER BY f_idx)) AS video_phash
  FROM bits GROUP BY doc_id)
SELECT d.doc_id, CAST(d.k AS BIGINT) AS n_frames, ph.video_phash
FROM d JOIN ph ON ph.doc_id = d.doc_id
""",
)
def llm_video_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-modality near-dup key: synthesize an FVID container of
    REAL PNG frames per document, decode every frame, per-frame
    integer average-hash, md5 over the ordered frame-hash sequence —
    temporal-order-sensitive perceptual dedup (two videos match iff
    every frame's aHash matches in order), completing modality dedup
    coverage (text winnow / image aHash / audio energy fingerprint /
    video frame-hash sequence).

    Scale posture: container walk + per-frame decode is the
    frame-sample harness shape (Arrow mapInPandas, blobs never
    shuffle); the digest collapses per-video state to 32 bytes before
    anything leaves the partition. The decoded key table is the shared
    session-cached relation (see _media_rel)."""
    return _media_rel(spark, sf_dir, "vphash").select(
        "doc_id", "n_frames", "video_phash"
    )


@register(
    "llm_ahash_pairs",
    tags=("llm", "multimodal", "dedup", "perceptual", "pairs"),
    oracle="""
-- Hamming-banded perceptual near-dup pairs over the REAL-decode aHash
-- (see llm_image_ahash). The oracle rebuilds the hash from the
-- closed-form pixel generator, then runs the same band/cap/pair
-- semantics: 4 x 16-bit bands, stop-band cap, candidate pairs sharing
-- >= 1 surviving band, exact Hamming distance <= 6 on the full hash.
WITH d AS (SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h FROM documents),
g AS (
  SELECT doc_id, y.range AS y, x.range AS x,
         ((doc_id * 31 + (((y.range * h) // 8) * w + ((x.range * w) // 8)) * 3) % 256
          + (doc_id * 31 + (((y.range * h) // 8) * w + ((x.range * w) // 8)) * 3 + 1) % 256
          + (doc_id * 31 + (((y.range * h) // 8) * w + ((x.range * w) // 8)) * 3 + 2) % 256
         ) // 3 AS gray
  FROM d, range(8) y, range(8) x),
m AS (SELECT doc_id, CAST(sum(gray) AS BIGINT) // 64 AS gray_mean FROM g GROUP BY doc_id),
hsh AS (
  SELECT g.doc_id,
         string_agg(CASE WHEN g.gray > m.gray_mean THEN '1' ELSE '0' END,
                    '' ORDER BY g.y, g.x) AS ahash
  FROM g JOIN m ON m.doc_id = g.doc_id GROUP BY g.doc_id),
bands AS (
  SELECT doc_id, b.range AS band_idx,
         substr(ahash, CAST(b.range * 16 + 1 AS INT), 16) AS band
  FROM hsh, range(4) b),
keep AS (SELECT band_idx, band FROM bands
         GROUP BY band_idx, band HAVING count(*) BETWEEN 2 AND 40),
pk AS (SELECT bands.doc_id, bands.band_idx, bands.band
       FROM bands JOIN keep USING (band_idx, band)),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS shared_bands
  FROM pk x JOIN pk y USING (band_idx, band)
  WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
ham AS (
  SELECT c.a, c.b, c.shared_bands,
         CAST(len(list_filter(range(1, 65),
                  i -> ha.ahash[CAST(i AS INT)] <> hb.ahash[CAST(i AS INT)]))
              AS BIGINT) AS hamming
  FROM cand c JOIN hsh ha ON ha.doc_id = c.a JOIN hsh hb ON hb.doc_id = c.b)
SELECT a, b, shared_bands, hamming FROM ham WHERE hamming <= 6
""",
)
def llm_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup PAIRS for the image modality — the
    imagededup/PDQ-style candidate join over the average-hash: split
    the 64-bit aHash into 4 x 16-bit bands; by pigeonhole, any pair
    within Hamming distance 3 shares at least one identical band —
    recall <= 3 is guaranteed ONLY for pairs whose shared band
    survives the 2..40 stop-band cap below (a true pair whose every
    shared band is over-popular is dropped with the bucket; the cap is
    applied identically in the oracle, so this is a semantics note,
    not a gate risk). Pairs up to the emitted threshold of 6 are
    best-effort, the standard LSH trade. Candidate generation
    is an equi-join on (band_idx, band) — never an all-pairs scan.
    Candidates are then verified with the exact 64-position Hamming
    distance and cut at <= 6.

    Scale shape: the same posting-list kernel as every near-dup family
    here — explode 4 band keys per image, ONE shuffle on the band key,
    ordered pair fan-out per bucket with a stop-band cap (a band shared
    by > 40 images is a low-information pattern — e.g. the all-dark
    half — whose quadratic fan-out buys no dedup signal; same valve as
    the stop-shingle / stop-fingerprint caps), then ONE count-aggregate
    on (a, b) for shared_bands. The per-doc 4x16-bit band INTEGERS ride
    through the fan-out (constant 32 bytes per posting), so exact
    verification is bit_count(xor) on the carried ints — no join back
    to the hash table and no 64-substring walk per candidate (the two
    extra shuffle stages the r10 verdict costed at >2x the oracle). The
    decoded key table is the shared session-cached relation
    (_media_rel); the single-reference lineage needs no per-query
    checkpoint."""
    hashed = _media_rel(spark, sf_dir, "ahash")
    bints = hashed.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, 3), i -> "
            "cast(conv(substring(ahash, i * 16 + 1, 16), 2, 10) AS BIGINT))"
        ).alias("v"),
        F.explode(
            F.expr(
                "transform(sequence(0, 3), i -> struct("
                "i AS band_idx, substring(ahash, i * 16 + 1, 16) AS band))"
            )
        ).alias("s"),
    ).select("doc_id", "v", "s.band_idx", "s.band")
    grouped = (
        bints.groupBy("band_idx", "band")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "v"))).alias("ds"))
        .filter(F.size("ds").between(2, 40))
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                X.ordered_pair_fanout(
                    "ds", "x.doc_id AS a, y.doc_id AS b, x.v AS va, y.v AS vb"
                )
            )
        ).alias("p")
    ).select("p.a", "p.b", "p.va", "p.vb")
    cand = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("shared_bands"),
        F.first("va").alias("va"),
        F.first("vb").alias("vb"),
    )
    return (
        cand.withColumn(
            "hamming",
            F.expr(
                "bit_count(va[0] ^ vb[0]) + bit_count(va[1] ^ vb[1]) + "
                "bit_count(va[2] ^ vb[2]) + bit_count(va[3] ^ vb[3])"
            ).cast("long"),
        )
        .filter(F.col("hamming") <= 6)
        .select("a", "b", "shared_bands", "hamming")
    )


@register(
    "llm_multimodal_dedup_clusters",
    tags=("llm", "multimodal", "dedup", "clusters", "iterative"),
    oracle="""
-- Cross-modality entity resolution: documents are the same "asset" if
-- they match on ANY modality key (exact text md5, REAL-decode image
-- aHash, REAL-decode video frame-hash digest). The oracle rebuilds
-- the image/video keys from the closed-form pixel generators, builds
-- the same per-key star edges, and resolves components as a
-- recursive-CTE transitive closure (the same fixpoint the Spark
-- min-label propagation kernel converges to).
WITH RECURSIVE
d AS (SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h FROM documents),
g AS (
  SELECT doc_id, y.range AS y, x.range AS x,
         ((doc_id * 31 + (((y.range * h) // 8) * w + ((x.range * w) // 8)) * 3) % 256
          + (doc_id * 31 + (((y.range * h) // 8) * w + ((x.range * w) // 8)) * 3 + 1) % 256
          + (doc_id * 31 + (((y.range * h) // 8) * w + ((x.range * w) // 8)) * 3 + 2) % 256
         ) // 3 AS gray
  FROM d, range(8) y, range(8) x),
m AS (SELECT doc_id, CAST(sum(gray) AS BIGINT) // 64 AS gray_mean FROM g GROUP BY doc_id),
img AS (
  SELECT g.doc_id,
         'i:' || string_agg(CASE WHEN g.gray > m.gray_mean THEN '1' ELSE '0' END,
                            '' ORDER BY g.y, g.x) AS mkey
  FROM g JOIN m ON m.doc_id = g.doc_id GROUP BY g.doc_id),
vd AS (SELECT doc_id, doc_id % 4 + 2 AS k FROM documents),
vg AS (
  SELECT vd.doc_id, f.range AS f_idx, p.range AS p_idx,
         ((vd.doc_id * 31 + f.range * 77 + p.range * 3) % 256
          + (vd.doc_id * 31 + f.range * 77 + p.range * 3 + 1) % 256
          + (vd.doc_id * 31 + f.range * 77 + p.range * 3 + 2) % 256) // 3 AS gray
  FROM vd, range(6) f, range(64) p
  WHERE f.range < vd.k),
vm AS (SELECT doc_id, f_idx, CAST(sum(gray) AS BIGINT) // 64 AS gm
       FROM vg GROUP BY doc_id, f_idx),
vbits AS (
  SELECT vg.doc_id, vg.f_idx,
         string_agg(CASE WHEN vg.gray > vm.gm THEN '1' ELSE '0' END,
                    '' ORDER BY vg.p_idx) AS fb
  FROM vg JOIN vm ON vm.doc_id = vg.doc_id AND vm.f_idx = vg.f_idx
  GROUP BY vg.doc_id, vg.f_idx),
vid AS (SELECT doc_id, 'v:' || md5(string_agg(fb, '|' ORDER BY f_idx)) AS mkey
        FROM vbits GROUP BY doc_id),
txt AS (SELECT doc_id, 't:' || md5(text) AS mkey FROM documents),
keys AS (SELECT * FROM img UNION ALL SELECT * FROM vid UNION ALL SELECT * FROM txt),
star AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY mkey) AS hub FROM keys),
edges AS (
  SELECT doc_id AS src, hub AS dst FROM star WHERE doc_id <> hub
  UNION SELECT hub, doc_id FROM star WHERE doc_id <> hub
  UNION SELECT doc_id, doc_id FROM documents),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
""",
)
def llm_multimodal_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality dedup-cluster resolution — the asset-level entity
    resolution a multimodal training-data pipeline runs before keep-
    best selection: a document joins a cluster if it matches any other
    on ANY modality key (exact text hash, perceptual image aHash from
    the REAL PNG decode, video frame-hash-sequence digest from the
    REAL container walk), then connected components give every doc its
    cluster keeper (min reachable id). Transitive chains across
    modalities (A=B by image, B=C by text => A,B,C one cluster) are
    exactly what per-modality dedup misses.

    Scale shape: edge generation is LINEAR, never pairwise — per
    modality key, every member links to the group's min doc_id (star
    edges), so a k-member group costs k-1 edges instead of k(k-1)/2;
    one hash shuffle per key-group, then the same min-label-propagation
    kernel as llm_dedup_clusters (O(diameter) rounds, 500k-edge-gated
    driver union-find fast path). The decode-heavy modality keys come
    from the shared session-cached relations (_media_rel) — already
    checkpointed, so the union is referenced twice (hubs + star)
    without re-decoding (README findings #1-#3)."""
    d = load(spark, sf_dir, "documents")
    txt = d.select("doc_id", F.concat(F.lit("t:"), F.md5("text")).alias("mkey"))
    img = _media_rel(spark, sf_dir, "ahash").select(
        "doc_id", F.concat(F.lit("i:"), "ahash").alias("mkey")
    )
    vid = _media_rel(spark, sf_dir, "vphash").select(
        "doc_id", F.concat(F.lit("v:"), "video_phash").alias("mkey")
    )
    keys = txt.unionByName(img).unionByName(vid).localCheckpoint(eager=False)
    hubs = keys.groupBy("mkey").agg(F.min("doc_id").alias("hub"))
    star = keys.join(hubs, "mkey").filter(F.col("doc_id") != F.col("hub"))
    pairs = star.select(F.col("hub").alias("a"), F.col("doc_id").alias("b")).distinct()
    return X.connected_components(pairs, d)
