"""Producer pipeline e2e (SURVEY §3.1): binlog-style events → filter →
dense sequence (restart-surviving high-watermark) → wire JSON topic —
then the consumer pipeline replays the topic to the golden pet table
(the Spark analog of the reference's leader==follower e2e,
cdc-mysql/scripts/run-test.sh)."""

from __future__ import annotations

import json
from pathlib import Path

from fluvio_demo_apps_rust_spark.config import PipelineProfile
from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS, PET_GOLDEN
from fluvio_demo_apps_rust_spark.streaming.pipeline import CdcPipeline
from fluvio_demo_apps_rust_spark.streaming.producer import CdcProducer


def _strip_sequence(line: str) -> str:
    """Un-sequenced 'binlog' event: what the producer sees pre-publish."""
    obj = json.loads(line)
    obj.pop("sequence", None)
    return json.dumps(obj, separators=(",", ":"))


def _producer(spark, tmp: Path) -> CdcProducer:
    return CdcProducer(
        spark,
        source_path=str(tmp / "binlog"),
        topic_path=str(tmp / "topic"),
        state_path=str(tmp / "pstate"),
        checkpoint_path=str(tmp / "pckpt"),
    )


def test_producer_sequences_and_consumer_applies(spark, tmp_path):
    binlog = tmp_path / "binlog"
    binlog.mkdir()

    # run 1: first six binlog events
    (binlog / "b0.jsonl").write_text(
        "\n".join(_strip_sequence(e) for e in PET_EVENTS[:6]) + "\n"
    )
    _producer(spark, tmp_path).run_available_now()

    topic = spark.read.text(str(tmp_path / "topic"))
    seqs = sorted(json.loads(r.value)["sequence"] for r in topic.collect())
    assert seqs == list(range(6))  # dense from 0

    # run 2: a RESTARTED producer publishes the rest; sequences continue
    (binlog / "b1.jsonl").write_text(
        "\n".join(_strip_sequence(e) for e in PET_EVENTS[6:]) + "\n"
    )
    _producer(spark, tmp_path).run_available_now()
    topic = spark.read.text(str(tmp_path / "topic"))
    rows = [json.loads(r.value) for r in topic.collect()]
    assert sorted(r["sequence"] for r in rows) == list(range(9))
    # sequence order == binlog position order (file id, offset)
    by_pos = sorted(rows, key=lambda r: (r["bn_file"]["fileName"], r["bn_file"]["offset"]))
    assert [r["sequence"] for r in by_pos] == list(range(9))

    # S6: losing the high-watermark file must NOT restart sequences at
    # 0 — the producer recovers the tail from the topic itself
    (tmp_path / "pstate" / "sequence_hwm.json").unlink()
    p3 = _producer(spark, tmp_path)
    assert p3.hwm == 8

    # consumer replays the produced topic → golden pet table
    profile = PipelineProfile(
        source_path=str(tmp_path / "topic"),
        checkpoint_path=str(tmp_path / "cckpt"),
        state_path=str(tmp_path / "cstate"),
    )
    CdcPipeline(spark, profile).run_available_now()
    pet = spark.read.parquet(str(tmp_path / "cstate/tables/flvdb/pet"))
    rows = sorted(
        (r.name, r.owner, r.species, r.sex,
         str(r.birth) if r.birth else None,
         str(r.last_vaccine) if r.last_vaccine else None)
        for r in pet.collect()
    )
    assert rows == sorted(PET_GOLDEN)
