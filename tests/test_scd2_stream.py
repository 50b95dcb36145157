"""Streaming SCD2 maintenance equals the batch fold over the full log."""

from __future__ import annotations

import os
import tempfile
import uuid
from pathlib import Path

from fluvio_demo_apps_rust_spark.operators.scd2 import scd2_intervals
from fluvio_demo_apps_rust_spark.streaming.scd2_stream import Scd2Maintainer

SCHEMA = "key long, sequence long, op_type string, status string"

# key 1: add→update across batches; key 2: add→delete; key 3: lives in
# batch 2 only; key 4: add then update+delete within one batch.
BATCH1 = [
    {"key": 1, "sequence": 10, "op_type": "Add", "status": "O"},
    {"key": 2, "sequence": 11, "op_type": "Add", "status": "O"},
    {"key": 4, "sequence": 12, "op_type": "Add", "status": "O"},
]
BATCH2 = [
    {"key": 1, "sequence": 20, "op_type": "Update", "status": "P"},
    {"key": 2, "sequence": 21, "op_type": "Delete", "status": None},
    {"key": 3, "sequence": 22, "op_type": "Add", "status": "O"},
    {"key": 4, "sequence": 23, "op_type": "Update", "status": "P"},
    {"key": 4, "sequence": 24, "op_type": "Delete", "status": None},
]


def _rows(df):
    return sorted(
        (r.key, r.status, r.valid_from_seq, r.valid_to_seq, r.is_current)
        for r in df.collect()
    )


def test_streaming_scd2_equals_batch_fold(spark):
    import json

    src = Path(tempfile.mkdtemp(prefix="scd2s_"))
    f1, f2 = src / "a.jsonl", src / "b.jsonl"
    f1.write_text("\n".join(json.dumps(r) for r in BATCH1) + "\n")
    f2.write_text("\n".join(json.dumps(r) for r in BATCH2) + "\n")
    os.utime(f1, (1_700_000_000, 1_700_000_000))
    os.utime(f2, (1_700_000_100, 1_700_000_100))

    m = Scd2Maintainer("key", "sequence", ("status",))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(m.apply)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="scd2s_ck_"))
        .queryName("scd2s_" + uuid.uuid4().hex[:8])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    full = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    expect = scd2_intervals(full, key_col="key", seq_col="sequence", attr_cols=("status",))
    assert _rows(m.versions) == _rows(expect)
    # spot semantics: key 2 deleted → its only version closed, not current
    got = {r.key: r for r in m.versions.collect() if r.key == 2}
    assert got[2].valid_to_seq == 21 and got[2].is_current is False
