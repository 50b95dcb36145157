"""Pins for the round-6 modality dedup keys: audio energy-transition
fingerprint, video frame-hash digest, Hamming-banded aHash pairs
(pigeonhole recall), and cross-modality cluster resolution — each
checked against an independent brute-force recompute, not the SQL
oracle (the oracle gate covers that separately)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.slow


def _brute_audio_fp(doc_id: int) -> tuple[int, str]:
    n = doc_id % 512 + 64
    s = (((doc_id * 7 + np.arange(n) * 13) % 65536) - 32768).astype(np.int64)
    nf = n // 64
    e = (s[: nf * 64].reshape(nf, 64) ** 2).sum(axis=1)
    bits = "".join("1" if int(e[i]) > int(e[i - 1]) else "0" for i in range(1, nf))
    return nf, bits


def test_audio_fingerprint_matches_brute_force(spark):
    """The WAV-decode path (encode -> RIFF parse -> frame -> energy ->
    transition bits) must agree with a direct numpy recompute from the
    sample generator, including the nf=1 empty-fingerprint edge."""
    from fluvio_demo_apps_rust_spark.functions.multimodal import (
        audio_fingerprint_features,
        synth_wav,
    )

    # doc_id 0 has n=64 -> exactly one frame -> empty fingerprint
    ids = [0, 1, 63, 64, 100, 511, 512, 1000]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: (r.n_frames, r.audio_fp)
        for r in audio_fingerprint_features(synth_wav(df)).collect()
    }
    assert set(got) == set(ids)
    for i in ids:
        assert got[i] == _brute_audio_fp(i), f"doc {i}"
    assert got[0][1] == ""  # single frame: no transitions


def _brute_video_phash(doc_id: int) -> tuple[int, str]:
    k = doc_id % 4 + 2
    fbs = []
    for f in range(k):
        arr = ((doc_id * 31 + f * 77 + np.arange(8 * 8 * 3)) % 256).astype(
            np.int64
        ).reshape(8, 8, 3)
        gray = arr.sum(axis=2) // 3
        m = int(gray.sum()) // 64
        fbs.append("".join("1" if int(v) > m else "0" for v in gray.reshape(-1)))
    return k, hashlib.md5("|".join(fbs).encode()).hexdigest()


def test_video_phash_matches_brute_force(spark):
    from fluvio_demo_apps_rust_spark.functions.multimodal import (
        synth_video,
        video_phash_features,
    )

    ids = [0, 1, 2, 3, 4, 17, 255, 256]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: (r.n_frames, r.video_phash)
        for r in video_phash_features(synth_video(df)).collect()
    }
    for i in ids:
        assert got[i] == _brute_video_phash(i), f"doc {i}"


def test_video_phash_is_temporal_order_sensitive():
    """Reversing the frame sequence must change the digest — the digest
    hashes the ORDERED frame-hash sequence, not the frame-hash set."""
    from fluvio_demo_apps_rust_spark.functions.media_png import encode_png
    from fluvio_demo_apps_rust_spark.functions.multimodal import (
        video_phash_features,
    )

    def container(frames: list[bytes]) -> bytes:
        return (
            b"FVID"
            + struct.pack("<I", len(frames))
            + b"".join(struct.pack("<I", len(p)) + p for p in frames)
        )

    f0 = encode_png((np.arange(192) % 256).astype(np.uint8).reshape(8, 8, 3))
    f1 = encode_png(((np.arange(192) * 7) % 256).astype(np.uint8).reshape(8, 8, 3))
    from fluvio_demo_apps_rust_spark.session import get_spark

    spark = get_spark("pytest")
    df = spark.createDataFrame(
        [(1, container([f0, f1])), (2, container([f1, f0]))],
        "doc_id long, blob binary",
    )
    rows = {r.doc_id: r.video_phash for r in video_phash_features(df).collect()}
    assert rows[1] != rows[2]


def _brute_ahash(doc_id: int) -> str:
    w, h = doc_id % 24 + 8, doc_id % 16 + 8
    bits = []
    grays = np.zeros((8, 8), dtype=np.int64)
    for y in range(8):
        for x in range(8):
            sy, sx = (y * h) // 8, (x * w) // 8
            base = doc_id * 31 + (sy * w + sx) * 3
            grays[y, x] = (base % 256 + (base + 1) % 256 + (base + 2) % 256) // 3
    m = int(grays.sum()) // 64
    for y in range(8):
        for x in range(8):
            bits.append("1" if grays[y, x] > m else "0")
    return "".join(bits)


def test_ahash_pairs_pigeonhole_recall(spark):
    """Every pair within Hamming distance 3 whose four bands all
    survive the stop-band cap MUST appear in llm_ahash_pairs' output
    (pigeonhole: d < 4 differing bits cannot touch all 4 bands), and
    every emitted pair's hamming/shared_bands must match brute force."""
    from fluvio_demo_apps_rust_spark.plans import REGISTRY

    hashes = {}
    import duckdb

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        ).fetchall()
    ]
    for i in ids:
        hashes[i] = _brute_ahash(i)

    # brute-force band buckets with the plan's cap semantics
    from collections import defaultdict

    buckets: dict = defaultdict(list)
    for i, hsh in hashes.items():
        for b in range(4):
            buckets[(b, hsh[b * 16 : (b + 1) * 16])].append(i)
    cand: dict = defaultdict(int)
    for members in buckets.values():
        if 2 <= len(members) <= 40:
            ms = sorted(members)
            for ai in range(len(ms)):
                for bi in range(ai + 1, len(ms)):
                    cand[(ms[ai], ms[bi])] += 1
    expect = {}
    for (a, b), shared in cand.items():
        ham = sum(1 for p in range(64) if hashes[a][p] != hashes[b][p])
        if ham <= 6:
            expect[(a, b)] = (shared, ham)

    got = {
        (r.a, r.b): (r.shared_bands, r.hamming)
        for r in REGISTRY["llm_ahash_pairs"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # pigeonhole face: hamming <= 3 pairs with all-uncapped bands present
    for (a, b), (_, ham) in expect.items():
        if ham <= 3:
            assert (a, b) in got


def test_multimodal_clusters_match_union_find(spark):
    """Cluster labels from the distributed kernel == a driver-side
    union-find over the same modality keys, brute-force recomputed."""
    import duckdb

    from fluvio_demo_apps_rust_spark.plans import REGISTRY

    rows = duckdb.sql(
        f"SELECT doc_id, md5(text) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    keys: dict = {}
    for doc_id, tmd5 in rows:
        _, vham = _brute_video_phash(doc_id)
        keys[doc_id] = [f"t:{tmd5}", f"i:{_brute_ahash(doc_id)}", f"v:{vham}"]

    parent = {i: i for i in keys}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_key: dict = {}
    for i, ks in keys.items():
        for k in ks:
            by_key.setdefault(k, []).append(i)
    for members in by_key.values():
        for m in members[1:]:
            union(members[0], m)
    expect = {i: find(i) for i in keys}

    got = {
        r.doc_id: r.cluster_id
        for r in REGISTRY["llm_multimodal_dedup_clusters"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect
