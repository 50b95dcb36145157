"""LLM-pipeline operators: semantic checks with planted duplicates."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.functions import dedup as X
from fluvio_demo_apps_rust_spark.functions import multimodal as M
from fluvio_demo_apps_rust_spark.functions import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "completely different content about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (4, "one two"),                                        # < 3 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    clusters = X.exact_dup_clusters(docs).collect()
    dup = [c for c in clusters if c.cnt > 1]
    assert len(dup) == 1 and dup[0].cnt == 2 and dup[0].keep_id == 0


def test_shingles_short_doc_empty(docs):
    out = docs.select("doc_id", X.word_shingles().alias("sh")).collect()
    by_id = {r.doc_id: r.sh for r in out}
    assert by_id[4] == []
    assert "the quick brown" in by_id[0]


def test_ngram_jaccard_finds_neardup(docs):
    pairs = {(r.a, r.b): r.jaccard for r in X.ngram_jaccard_pairs(docs).collect()}
    assert pairs[(0, 3)] == 1.0          # exact dup
    assert 0.4 < pairs[(0, 1)] < 1.0     # near dup
    assert (0, 2) not in pairs           # nothing shared


def test_ngram_jaccard_posting_cap(spark):
    # every doc opens with the same stop-shingle; pairwise they share
    # nothing else, so capping below the corpus size must drop ALL pairs
    rows = [(i, f"common stop shingle unique{i} text{i} words{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = X.ngram_jaccard_pairs(df).collect()
    assert len(uncapped) == 15                    # C(6,2) via the hot key
    capped = X.ngram_jaccard_pairs(df, max_posting=5).collect()
    assert capped == []                           # hot posting (6 docs) dropped
    # a cap above every posting size is a no-op
    same = {(r.a, r.b): r.jaccard for r in X.ngram_jaccard_pairs(df, max_posting=6).collect()}
    assert same == {(r.a, r.b): r.jaccard for r in uncapped}


def test_minhash_lsh_candidates(spark, docs):
    sig = X.minhash_signatures(docs, spark)
    # identical docs → identical signatures
    dig = {r.doc_id: r.sig_digest for r in X.minhash_digest(sig).collect()}
    assert dig[0] == dig[3]
    assert dig[0] != dig[2]
    pairs = {(r.a, r.b) for r in X.lsh_bucket_pairs(sig, bands=4).collect()}
    assert (0, 3) in pairs


def test_simhash_distance(spark, docs):
    sh = {r.doc_id: r.simhash for r in X.simhash60(docs).collect()}
    assert sh[0] == sh[3]
    d01 = bin(sh[0] ^ sh[1]).count("1")
    d02 = bin(sh[0] ^ sh[2]).count("1")
    assert d01 < d02  # near-dup closer than unrelated


def test_brute_force_topk_self_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.01, 0.0]),   # nearly identical to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3)
    got = [(r.n_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got[0][0] == 1          # closest neighbor
    assert got[-1][0] == 3         # opposite vector ranked last
    cos = {r.n_id: r.cos_sim for r in out.collect()}
    assert cos[3] == -1.0 and cos[2] == 0.0


def test_lsh_bucket_recall_on_clones(spark):
    rows = [(i, [float(i % 7 + 1)] * 8 + [0.0] * 56) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3)
    out = S.lsh_bucketed_topk(emb, q, k=5, nb=4, dim=64)
    # scaled clones share direction → same bucket → neighbors found
    assert out.count() > 0
    assert all(r.cos_sim == 1.0 for r in out.collect() if r.rank == 1)


def test_multimodal_stub_matches_meta(spark, docs):
    blobs = M.attach_blob(docs)
    meta = {r.doc_id: r for r in M.blob_meta(blobs).collect()}
    stub = {r.doc_id: r for r in M.decode_stub(blobs).collect()}
    assert meta.keys() == stub.keys()
    for k in meta:
        assert meta[k].sha256 == stub[k].sha256
        assert meta[k].width == stub[k].width
        assert meta[k].byte_len == stub[k].byte_len


try:
    import PIL  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


@pytest.mark.skipif(_HAS_PIL, reason="PIL present: decode_real is live")
def test_decode_real_raises_without_pil(docs):
    with pytest.raises(NotImplementedError):
        M.decode_real(docs)


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed in sandbox")
def test_decode_real_with_pil(spark):
    """Live-decode proof for environments with media libs: a real PNG
    through the same Arrow harness must yield its true geometry."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id long, blob binary")
    (row,) = M.decode_real(df).collect()
    assert (row.width, row.height, row.n_frames) == (17, 9, 1)
    assert row.byte_len == len(buf.getvalue())


def test_frame_sample_fanout(spark, docs):
    blobs = M.attach_blob(docs)
    frames = M.frame_sample_stub(blobs, frame_size=64, max_frames=16)
    got = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    lens = {r.doc_id: r.byte_len for r in M.blob_meta(blobs).collect()}
    for r in got.collect():
        expect = min(16, max(1, -(-lens[r.doc_id] // 64)))
        assert r.n == expect and r.mx == expect - 1
    # full frames are 64 bytes
    full = frames.filter(F.col("frame_idx") == 0).collect()
    assert all(f.frame_len <= 64 for f in full)


def test_resize_stub_binary_roundtrip(spark, docs):
    blobs = M.attach_blob(docs)
    out = M.resize_stub(blobs, target_bytes=32).collect()
    assert all(r.out_len == 32 and len(bytes(r.resized)) == 32 for r in out)


def test_ivf_topk_exact_on_clones(spark):
    rows = [(i, [float(i % 5 + 1)] * 8 + [0.0] * 56) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3)
    out = S.ivf_topk(emb, q, k=5, ncells=8, nprobe=2)
    res = out.collect()
    assert len(res) > 0
    # scaled clones share direction → same cell → cosine-1 neighbors rank first
    assert all(r.cos_sim == 1.0 for r in res if r.rank == 1)


def test_minhash_param_mirror(spark):
    # the driver-side literal params must equal the SQL-md5 relation
    sql_params = {r.j: (r.a, r.b) for r in X.minhash_params(spark, 16).collect()}
    py_params = dict(enumerate(X._minhash_param_values(16)))
    assert sql_params == py_params


def test_simhash_band_pairs_catch_neardups(spark, docs):
    # pigeonhole: any pair with hamming < 4 must appear as a candidate
    sh = X.simhash60(docs)
    cand = {(r.a, r.b) for r in X.simhash_band_pairs(sh).collect()}
    assert (0, 3) in cand                      # exact dup: hamming 0
    vals = {r.doc_id: r.simhash for r in sh.collect()}
    for (a, b) in cand:
        assert a < b
    d01 = bin(vals[0] ^ vals[1]).count("1")
    if d01 < 4:
        assert (0, 1) in cand


def test_embedding_candidate_pairs_shape(spark):
    from fluvio_demo_apps_rust_spark.functions import similarity as S2

    rows = [(i, [float((i * 7 + j) % 13) - 6.0 for j in range(8)]) for i in range(40)]
    rows.append((100, rows[0][1]))  # exact duplicate vector of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cand = S2.embedding_candidate_pairs(df, nb=8, bands=2, dim=8)
    pairs = {(r.a, r.b) for r in cand.collect()}
    assert (0, 100) in pairs                   # identical signature → candidate
    assert all(a < b for a, b in pairs)
    n = df.count()
    assert len(pairs) < n * (n - 1) / 2        # a strict subset of all-pairs


def test_semdedup_prune_semantics(spark):
    import pyspark.sql.functions as F
    from fluvio_demo_apps_rust_spark.functions import similarity as S

    # 4 vectors in 2d: ids 0,1 are the centroids. 2 is nearly parallel
    # to 0 (same cell, high cos -> pruned by 0); 3 aligns with 1 but
    # low-similarity to its cell-mates? make 3 parallel to 1 -> pruned.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.999, 0.01]),
        (3, [0.01, 0.999]),
        (4, [-1.0, 0.5]),   # cell of 1 (cos<0 vs 0, ~0.44 vs 1) but far
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in S.semdedup_prune(df, ncells=2, tau=0.9).collect()}
    assert out[0].pruned is False and out[0].keeper == 0
    assert out[2].pruned is True and out[2].keeper == 0
    assert out[3].pruned is True and out[3].keeper == 1
    assert out[4].pruned is False and out[4].keeper == 4


def test_semdedup_prunes_on_testdata(spark):
    from fluvio_demo_apps_rust_spark.functions import similarity as S

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = S.semdedup_prune(e, ncells=16, tau=0.3)
    n_pruned = out.filter("pruned").count()
    assert out.count() == 500
    assert n_pruned > 0, "tau=0.3 should prune at least one near-dup"


def test_semdedup_arrow_kernel_matches_sql_kernel(spark):
    """The Arrow/numpy matmul kernel must reproduce the pure-SQL plan
    (fold dots + joins) row-for-row on real data — pins assignment
    tie-breaks, 6-dp rounding, and keeper-min semantics."""
    from fluvio_demo_apps_rust_spark.functions import similarity as S

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    fast = {r.vec_id: (r.cell, r.keeper, r.pruned)
            for r in S.semdedup_prune(e, ncells=16, tau=0.3).collect()}
    gold = {r.vec_id: (r.cell, r.keeper, r.pruned)
            for r in S._semdedup_prune_sql(e, ncells=16, tau=0.3).collect()}
    assert fast == gold


def test_kmeans_groups_separated_clusters(spark):
    from fluvio_demo_apps_rust_spark.functions import similarity as S

    # two tight 2-d blobs; init centroids = first 2 vectors (one per blob)
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.1, 0.2]),
        (3, [9.8, 10.1]),
        (4, [0.2, 0.1]),
        (5, [10.2, 9.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.cluster for r in S.kmeans(df, k=2, iters=2).collect()}
    assert out[0] == out[2] == out[4] == 0
    assert out[1] == out[3] == out[5] == 1


def test_kmeans_reassigns_after_centroid_update(spark):
    from fluvio_demo_apps_rust_spark.functions import similarity as S

    # Initial centroids (ids 0, 1) sit together, so round-0 assignment
    # puts everything in one cell; after one mean recompute the far
    # blob's mass pulls a centroid over and the split appears.
    rows = [
        (0, [0.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.1, 0.1]),
        (3, [20.0, 20.0]),
        (4, [20.1, 19.9]),
        (5, [19.9, 20.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.cluster for r in S.kmeans(df, k=2, iters=2).collect()}
    assert out[3] == out[4] == out[5]
    assert out[0] == out[2]
    assert out[0] != out[3]


def test_gopher_rules_flags(spark):
    from fluvio_demo_apps_rust_spark.functions import text as TX

    good = "the quick brown fox jumps over and over with many of the " * 6
    bullets = "\n".join("- item the be to of and that have with" for _ in range(10))
    symbols = "the be of and " + "# " * 60
    rows = [(1, good), (2, "too short"), (3, bullets), (4, symbols)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in df.select("doc_id", *TX.gopher_columns()).collect()}
    assert out[1].passes is True
    assert out[2].passes is False  # n_words < 50
    assert out[3].bullet_frac == 1.0 and out[3].passes is False
    assert out[4].symbol_ratio > 0.1 and out[4].passes is False


def test_domain_mixture_uniform_weights(spark):
    from fluvio_demo_apps_rust_spark.functions import curation as C

    rows = [
        (1, "a b c d", "web"),
        (2, "a b c d", "web"),
        (3, "a b c d e f g h", "web"),
        (4, "a b c d", "books"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in C.domain_mixture(df).collect()}
    assert out["web"].n_docs == 3 and out["web"].n_tokens == 16
    assert out["books"].n_docs == 1 and out["books"].n_tokens == 4
    assert out["web"].token_share == 0.8
    # uniform target is 0.5 each: web over-represented -> weight < 1
    assert out["web"].uniform_weight == 0.625
    assert out["books"].uniform_weight == 2.5


def test_unigram_surprise_ranks_rare_tokens_higher(spark):
    from fluvio_demo_apps_rust_spark.functions import text as TX

    rows = [
        (1, "common common common common"),
        (2, "common common rare1 rare2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in TX.unigram_surprise(df).collect()}
    # doc 2 holds the two singleton tokens -> higher mean surprise
    assert out[2].surprise > out[1].surprise
    assert out[1].n_tokens == 4 and out[2].n_tokens == 4


def test_tfidf_top_terms_prefers_rare_repeated_terms(spark):
    from fluvio_demo_apps_rust_spark.functions import text as TX

    rows = [
        (1, "shared shared zebra zebra zebra"),
        (2, "shared shared other"),
        (3, "shared filler words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = TX.tfidf_top_terms(df, k=1).collect()
    top = {r.doc_id: r.term for r in out}
    # 'zebra': tf=3, df=1 -> 3*(ln(4/2)+1)=5.08 dominates 'shared'
    # (tf=2, df=3 -> 2*(ln(4/4)+1)=2.0)
    assert top[1] == "zebra"
    # doc 2: 'shared' (2.0) still beats singleton 'other' (1*1.693)
    assert top[2] == "shared"
    # doc 3: all tf=1 -> the rare (df=1) terms tie at 1.693; term-asc
    # tiebreak picks 'filler'
    assert top[3] == "filler"


def test_gram_matrix_exact_small(spark):
    from fluvio_demo_apps_rust_spark.functions import similarity as S

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    out = {(r.i, r.j): r.gram for r in S.gram_matrix(df).collect()}
    # X^T X for rows (1,2),(3,4): [[10,14],[14,20]] — upper triangle only
    assert out == {(0, 0): 10.0, (0, 1): 14.0, (1, 1): 20.0}


def test_knn_classify_votes_majority(spark):
    from fluvio_demo_apps_rust_spark.functions import similarity as S

    # probes 0,1 sit in two well-separated direction clusters; each
    # cluster's neighbors carry one label, so the vote is unanimous.
    rows = [
        (0, [1.0, 0.0], 7),
        (1, [0.0, 1.0], 9),
        (2, [0.9, 0.1], 7),
        (3, [0.95, 0.05], 7),
        (4, [0.1, 0.9], 9),
        (5, [0.05, 0.95], 9),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r.vec_id: r for r in S.knn_classify(df, n_probes=2, k=2).collect()}
    assert out[0].pred_label == 7 and out[0].correct is True
    assert out[1].pred_label == 9 and out[1].correct is True


def test_bm25_orders_by_term_density(spark):
    from fluvio_demo_apps_rust_spark.functions import text as TX

    rows = [
        (0, "spark spark spark filler filler"),
        (1, "spark filler filler filler filler"),
        (2, "filler filler filler filler filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.score for r in TX.bm25_scores(df, ("spark",)).collect()}
    assert out[0] > out[1] > out[2] == 0.0


def test_pq_adc_exact_clone_ranks_first(spark):
    from fluvio_demo_apps_rust_spark.functions import similarity as S

    # deterministic 16-dim corpus; vec 25 clones codebook vector 3, so
    # probe 3's ADC distance to 25 is exactly 0 and it ranks first.
    # modulus > corpus size so no two vectors collide by periodicity
    rows = [(i, [float((i * 31 + j * 7) % 97) / 3.0 - 5.0 for j in range(16)]) for i in range(25)]
    rows.append((25, rows[3][1]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.pq_adc_topk(emb, n_probes=4, k=3, m=4, ncode=8)
    top = {r.q_id: r for r in out.filter("rank = 1").collect()}
    assert top[3].n_id == 25 and top[3].adc_dist == 0.0
    assert out.filter("n_id = q_id").count() == 0  # self excluded


def test_ivf_pq_clone_found_when_cell_probed(spark):
    from fluvio_demo_apps_rust_spark.functions import similarity as S

    rows = [(i, [float((i * 31 + j * 7) % 97) / 3.0 - 5.0 for j in range(16)]) for i in range(25)]
    rows.append((25, rows[3][1]))  # clone of codebook/centroid vector 3
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.ivf_pq_topk(emb, n_probes=4, k=3, ncells=8, nprobe=2, m=4, ncode=8)
    res = out.collect()
    # probe 3's nearest cell is its own (L2 0 to centroid 3), so the
    # clone (same cell, ADC 0) must rank first
    top = {r.q_id: r for r in res if r.rank == 1}
    assert top[3].n_id == 25 and top[3].adc_dist == 0.0
    assert all(r.q_id != r.n_id for r in res)


def _py_winnow(text: str):
    """Python reference of functions/text.py:winnow_fingerprints."""
    from fluvio_demo_apps_rust_spark.functions.text import (
        WINNOW_B,
        WINNOW_K,
        WINNOW_M,
        WINNOW_W,
    )

    codes = [ord(c) for c in text]
    hashes = []
    for i in range(len(codes) - WINNOW_K + 1):
        a = 0
        for x in codes[i : i + WINNOW_K]:
            a = (a * WINNOW_B + x) % WINNOW_M
        hashes.append(a)
    if len(hashes) >= WINNOW_W:
        fps = {
            min(hashes[i : i + WINNOW_W])
            for i in range(len(hashes) - WINNOW_W + 1)
        }
    else:
        fps = set(hashes)
    return fps


def test_winnow_fingerprint_moss_guarantee_and_parity(spark):
    """MOSS property: two documents sharing a substring of length
    >= k + w - 1 share at least one fingerprint; and the Spark
    pipeline's digest equals the Python reference's digest."""
    import hashlib

    from fluvio_demo_apps_rust_spark.functions.text import winnow_fingerprints

    shared = "the quick brown fox jumps over it"  # 33 chars >= 8+16-1
    a = "zzyy aabbcc " + shared + " qq 0123456789 qq"
    b = "totally different prefix here " + shared + " and suffix"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = {r.doc_id: r for r in winnow_fingerprints(df).collect()}
    fa, fb = _py_winnow(a), _py_winnow(b)
    assert fa & fb, "shared substring must yield a shared fingerprint"
    for doc_id, text in ((1, a), (2, b)):
        fp = sorted(_py_winnow(text))
        digest = hashlib.md5(",".join(map(str, fp)).encode()).hexdigest()
        assert rows[doc_id].fp_digest == digest
        assert rows[doc_id].n_fingerprints == len(fp)


def test_tokenize_arrow_pattern_matches_re2_on_non_ascii():
    """r8 ADVICE: Python re's \\s is Unicode-aware while the DuckDB
    oracle's RE2 \\s is ASCII-only ([\\t\\n\\f\\r ] — note: NO \\v) —
    the gate corpus is ASCII so the driver can never catch a
    divergence. Pin the two patterns token-for-token on the nasty
    inputs: NBSP (U+00A0), vertical tab, unicode letters, mixed
    ASCII whitespace. The literals here intentionally DUPLICATE the
    patterns in plans/llm.py llm_udf_tokenize_arrow (Spark side) and
    its oracle (RE2 side); if either drifts, this fails."""
    import re

    import duckdb

    py_pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]"
    re2_pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    cases = [
        "plain ascii text 123, with (punct)!",
        "nbsp\u00a0separated\u00a0words",
        "vertical\x0btab and form\x0cfeed",
        "café naïve — em-dash あ",
        " \t\r\n mixed\fws ",
        "",
        " \x0b ",  # only exotic whitespace-ish codepoints
    ]
    con = duckdb.connect()
    for s in cases:
        got_py = re.findall(py_pat, s)
        got_re2 = con.execute(
            "SELECT regexp_extract_all(?, ?)", [s, re2_pat]
        ).fetchone()[0]
        assert got_py == got_re2, (s, got_py, got_re2)


def test_bpe_arrow_apply_matches_jvm_chain(spark):
    """The trained merge table applied through the Arrow/pandas path
    (functions/text.bpe_apply_merges_pandas — what a mapInPandas
    tokenizer body runs) must tokenize every vocabulary word exactly
    like the JVM replace chain bpe_train applied. This is the swap-in
    guarantee for the llm_udf_tokenize_arrow harness."""
    import pandas as pd

    from fluvio_demo_apps_rust_spark.functions.text import (
        bpe_apply_merges_pandas,
        bpe_spaced_state,
        bpe_train,
    )

    docs = [
        "the theme of the thesis is the theory",
        "lower lowest newer newest wider widest",
        "hello hello help helm hemp",
        "aaa aaaa aaaaa ab ba abab",
        "punct, punct, punct! 123 123 12",
    ]
    words = (
        spark.createDataFrame([(t,) for t in docs], "text string")
        .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    state, merges = bpe_train(bpe_spaced_state(words), gens=3, per_gen=4)
    assert merges, "training must produce merges on this corpus"
    jvm = {r.w: r.s.strip() for r in state.collect()}
    ws = pd.Series(sorted(jvm))
    arrow = dict(zip(ws, bpe_apply_merges_pandas(ws, merges)))
    assert arrow == jvm
    # and at least one multi-generation (length>2) token must exist,
    # i.e. generation 2+ merged a generation-1 output
    assert any(len(t) > 2 for s in jvm.values() for t in s.split(" "))


def test_bpe_min_count_floor(spark):
    """The 100 TB-posture training bound (r12 VERDICT): bpe_train's
    min_count floors the word-frequency relation feeding every
    generation's pair aggregation.

    (a) Fixture no-op, pinned: the sf0.001 documents vocabulary has
        zero words below c=2 (template-generated, closed vocab), so a
        small floor learns the IDENTICAL merge list — the oracle-gated
        BPE queries are unaffected by the capped path existing.
    (b) The bound is real: on a corpus where one rare (c=1) word would
        otherwise dominate pair counts, min_count=2 excludes it from
        TRAINING (its pair never becomes a merge) while the learned
        merges still APPLY to the full state, so the rare word is
        still tokenized by the frequent-vocab rules."""
    from fluvio_demo_apps_rust_spark.functions.text import (
        bpe_spaced_state,
        bpe_train,
    )
    from fluvio_demo_apps_rust_spark.plans.base import load

    # (a) fixture-scale no-op
    d = load(spark, "/root/testdata/sf0.001", "documents")
    wx = d.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")).where(
        F.length("w") >= 1
    )
    fixture_words = wx.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    assert fixture_words.where(F.col("c") < 2).count() == 0
    _, base_merges = bpe_train(bpe_spaced_state(fixture_words), gens=2, per_gen=4)
    _, floored_merges = bpe_train(
        bpe_spaced_state(fixture_words), gens=2, per_gen=4, min_count=2
    )
    assert floored_merges == base_merges

    # (b) the floor genuinely bounds training input
    words = spark.createDataFrame(
        # 'zq' appears in ONE rare word with weight 1 but tops the
        # unfloored pair count via 95 z-q adjacencies (> the 90
        # c-weighted a-b pairs); every frequent word avoids that pair.
        [("zq" * 95, 1), ("ab", 50), ("abc", 40)],
        "w string, c long",
    )
    _, unfloored = bpe_train(bpe_spaced_state(words), gens=1, per_gen=1)
    state2, floored = bpe_train(bpe_spaced_state(words), gens=1, per_gen=1, min_count=2)
    assert unfloored == [("z", "q")]  # the rare word dominates untrained
    assert floored == [("a", "b")]  # floored training never sees it
    tokenized = {r.w: r.s.strip() for r in state2.collect()}
    # merges still APPLY to the rare word (here: no 'ab' inside it, so
    # it stays fully split — but it IS present in the returned state)
    assert tokenized["zq" * 95] == " ".join("zq" * 95)
    assert tokenized["ab"] == "ab"
    assert tokenized["abc"] == "ab c"


def _py_bpe_reference(word_counts, gens, per_gen):
    """Pure-Python reference of the batched-generation BPE in
    functions/text.bpe_train: spaced-state strings, per-generation
    weighted pair counts, top-(per_gen) by (count DESC, a, b), applied
    in rank order with str.replace's leftmost-nonoverlap semantics."""
    state = {w: " " + " ".join(w) + " " for w in word_counts}
    merges = []
    for _ in range(gens):
        counts = {}
        for w, c in word_counts.items():
            ts = state[w].strip().split(" ")
            for a, b in zip(ts, ts[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:per_gen]
        if not top:
            break
        for (a, b), _n in top:
            merges.append((a, b))
            for w in state:
                state[w] = state[w].replace(f" {a} {b} ", f" {a}{b} ")
    return {w: s.strip() for w, s in state.items()}, merges


@pytest.mark.slow
def test_bpe_three_paths_agree_on_random_corpora(spark):
    """JVM replace chain (bpe_train), pandas/Arrow chain
    (bpe_apply_merges_pandas), and the pure-Python reference must
    produce the identical merge table AND identical tokenization on
    random collision-heavy corpora (3-letter alphabet -> dense pair
    ties, exercising the (count DESC, a ASC, b ASC) tie-break)."""
    import random

    import pandas as pd

    from fluvio_demo_apps_rust_spark.functions.text import (
        bpe_apply_merges_pandas,
        bpe_spaced_state,
        bpe_train,
    )

    rng = random.Random(909)
    for trial in range(6):
        words = {
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 7))): rng.randint(1, 9)
            for _ in range(rng.randint(3, 25))
        }
        ref_state, ref_merges = _py_bpe_reference(words, gens=2, per_gen=3)
        wdf = spark.createDataFrame(list(words.items()), "w string, c long")
        state, merges = bpe_train(bpe_spaced_state(wdf), gens=2, per_gen=3)
        assert merges == ref_merges, (trial, merges, ref_merges)
        jvm = {r.w: r.s.strip() for r in state.collect()}
        assert jvm == ref_state, trial
        ws = pd.Series(sorted(words))
        arrow = dict(zip(ws, bpe_apply_merges_pandas(ws, merges)))
        assert arrow == ref_state, trial


def test_bpe_arrow_word_split_matches_jvm_on_non_ascii():
    """llm_bpe_tokenize_arrow splits words in pandas with an explicit
    ASCII class that must equal Java's \\s ([ \\t\\n\\x0B\\f\\r]) used
    by the JVM path's F.split('\\s+') — Python's own \\s is
    Unicode-aware and would split on NBSP where Java keeps it inside a
    word. Pin the class on NBSP / vertical tab / mixed whitespace."""
    import re

    import pandas as pd

    py_ascii = r"[ \t\n\x0b\f\r]+"
    cases = [
        "plain words here",
        "nbsp\u00a0stays inside\u00a0word",
        "vertical\x0btab splits",
        "tabs\tand\nnewlines and\fformfeed",
        " leading trailing ",
    ]
    for s in cases:
        got = [w for w in pd.Series([s.lower()]).str.split(py_ascii, regex=True)[0] if w]
        # Java \s reference set, emulated char-by-char
        java_ws = set(" \t\n\x0b\f\r")
        ref, cur = [], ""
        for ch in s.lower():
            if ch in java_ws:
                if cur:
                    ref.append(cur)
                cur = ""
            else:
                cur += ch
        if cur:
            ref.append(cur)
        assert got == ref, (s, got, ref)
        assert not any(re.search(py_ascii, w) for w in got)
