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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def change_log(draw):
    """Random change log over ≤4 keys: per key an Add-first sequence of
    ops where Delete, if present, is last (a deleted key stays dead —
    matching the generator contract of the batch operator's input)."""
    n_keys = draw(st.integers(1, 4))
    rows = []
    seq = 0
    for key in range(n_keys):
        n_ops = draw(st.integers(1, 5))
        ends_deleted = draw(st.booleans())
        for i in range(n_ops):
            seq += draw(st.integers(1, 3))
            last = i == n_ops - 1
            if last and ends_deleted:
                rows.append({"key": key, "sequence": seq, "op_type": "Delete", "status": None})
            else:
                rows.append({"key": key, "sequence": seq, "op_type": "Add" if i == 0 else "Update",
                             "status": draw(st.sampled_from(["O", "P", "F"]))})
    rows.sort(key=lambda r: r["sequence"])
    n_cuts = min(draw(st.integers(0, 2)), max(0, len(rows) - 1))
    cuts = sorted(draw(st.sets(st.integers(1, max(1, len(rows) - 1)), min_size=n_cuts, max_size=n_cuts)))
    batches, prev = [], 0
    for c in cuts + [len(rows)]:
        if rows[prev:c]:
            batches.append(rows[prev:c])
        prev = c
    return rows, batches


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(change_log())
def test_streaming_scd2_property_vs_batch(spark, log):
    rows, batches = log
    m = Scd2Maintainer("key", "sequence", ("status",))
    for i, b in enumerate(batches):
        m.apply(spark.createDataFrame(b, SCHEMA), i)
    expect = scd2_intervals(
        spark.createDataFrame(rows, SCHEMA),
        key_col="key", seq_col="sequence", attr_cols=("status",),
    )
    assert _rows(m.versions) == _rows(expect)


def test_pipeline_scd2_history_across_restart(spark, tmp_path):
    """Pipeline-integrated SCD2: the version history maintained across
    two pipeline instances (restart + new events) must equal the batch
    fold over ALL changes, and its current keys must equal the applied
    replica table's key set."""
    from pathlib import Path

    import pyspark.sql.functions as F

    from fluvio_demo_apps_rust_spark.codec import parse_events
    from fluvio_demo_apps_rust_spark.config import PipelineProfile
    from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS
    from fluvio_demo_apps_rust_spark.streaming.pipeline import CdcPipeline
    from fluvio_demo_apps_rust_spark.streaming.scd2_stream import changes_from_events

    topic = tmp_path / "topic"
    topic.mkdir()
    (topic / "events-0.jsonl").write_text("\n".join(PET_EVENTS[:6]) + "\n")
    profile = PipelineProfile(
        source_path=str(topic),
        checkpoint_path=str(tmp_path / "ckpt"),
        state_path=str(tmp_path / "state"),
        scd2_history=True,
    )
    CdcPipeline(spark, profile).run_available_now()
    (topic / "events-1.jsonl").write_text("\n".join(PET_EVENTS[6:]) + "\n")
    pipe2 = CdcPipeline(spark, profile)
    assert ("flvdb", "pet") in pipe2.scd2  # history reloaded from disk
    pipe2.run_available_now()

    got = pipe2.scd2[("flvdb", "pet")].versions
    all_events = parse_events(
        spark.createDataFrame([(e,) for e in PET_EVENTS], "value string")
    )
    expect = scd2_intervals(
        changes_from_events(all_events).drop("db", "table"),
        key_col="key", seq_col="sequence", attr_cols=("attrs",),
    )

    def rows(df):
        return {
            (r.key, frozenset((r.attrs or {}).items()), r.valid_from_seq,
             r.valid_to_seq, r.is_current)
            for r in df.collect()
        }

    assert rows(got) == rows(expect)
    # current versions == live replica rows (keyed by first column)
    pet = spark.read.parquet(str(Path(profile.state_path) / "tables/flvdb/pet"))
    live_keys = sorted(r[0] for r in pet.select(pet.columns[0]).collect())
    cur_keys = sorted(
        r.key for r in got.filter(F.col("is_current")).collect()
    )
    assert cur_keys == live_keys
