"""Spark-4 default ANSI mode turns x/0 into a mid-job
SparkArithmeticException — even for DOUBLES (probed: lit(1.0)/lit(0.0)
throws DIVIDE_BY_ZERO). Queries that divide by a data-derived quantity
must therefore filter the degenerate rows on BOTH engines (r9 ADVICE):
llm_wer_eval divides by the reference word count and by length(ref_sub)
(an empty/whitespace-only document), llm_random_projection divides by
the squared input norm (an all-zero embedding). The shipped fixtures
contain neither vector, so these tests build poisoned twins."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from fluvio_demo_apps_rust_spark.plans import REGISTRY


def _poisoned_sf(tmp_path) -> str:
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": ["the cat sat on the mat", "", "   \t  "],
            "lang": ["en", "en", "en"],
            "source": ["web", "web", "web"],
            "n_chars": pa.array([22, 0, 6], type=pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    emb = pa.table(
        {
            "vec_id": pa.array([1, 2], type=pa.int64()),
            "embedding": pa.array(
                [[0.5] * 64, [0.0] * 64], type=pa.list_(pa.float32())
            ),
            "label": pa.array([0, 1], type=pa.int32()),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_wer_eval_survives_empty_documents(spark, tmp_path):
    sf = _poisoned_sf(tmp_path)
    rows = REGISTRY["llm_wer_eval"].fn(spark, sf).collect()
    # doc 1 scored; docs 2 (empty) and 3 (whitespace-only → zero ref
    # words AND empty trimmed ref_sub) filtered, not thrown
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].n_ref_words == 6


def test_random_projection_survives_zero_vector(spark, tmp_path):
    sf = _poisoned_sf(tmp_path)
    rows = REGISTRY["llm_random_projection"].fn(spark, sf).collect()
    # vec 2 is all-zero (nx == 0) — filtered, not thrown
    assert [r.vec_id for r in rows] == [1]
    assert rows[0].norm_ratio is not None
