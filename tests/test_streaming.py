"""Structured Streaming CDC pipeline e2e: ingest the pet scenario from
an event-file directory, materialize tables, then restart with new
events — state, registry, and watermarks must resume correctly
(the reference's resume/offset behavior, SURVEY §2.4 T5/T6)."""

from __future__ import annotations

from pathlib import Path

from fluvio_demo_apps_rust_spark.config import Filters, PipelineProfile
from fluvio_demo_apps_rust_spark.fixtures import PET_COLUMNS, PET_EVENTS, PET_GOLDEN
from fluvio_demo_apps_rust_spark.streaming.pipeline import CdcPipeline


def _profile(tmp_path: Path, **kw) -> PipelineProfile:
    return PipelineProfile(
        source_path=str(tmp_path / "topic"),
        checkpoint_path=str(tmp_path / "ckpt"),
        state_path=str(tmp_path / "state"),
        **kw,
    )


def _write_events(tmp_path: Path, name: str, events: list[str]) -> None:
    d = tmp_path / "topic"
    d.mkdir(exist_ok=True)
    (d / name).write_text("\n".join(events) + "\n")


def test_stream_pet_then_restart(spark, tmp_path):
    # batch 1: first six events land in the topic directory
    _write_events(tmp_path, "events-0.jsonl", PET_EVENTS[:6])
    profile = _profile(tmp_path)
    pipe = CdcPipeline(spark, profile)
    pipe.run_available_now()

    pet = spark.read.parquet(str(tmp_path / "state/tables/flvdb/pet"))
    assert pet.count() == 2  # Puffball + Jack, last_vaccine added

    # restart: NEW pipeline instance (fresh driver), remaining events arrive
    _write_events(tmp_path, "events-1.jsonl", PET_EVENTS[6:])
    pipe2 = CdcPipeline(spark, profile)
    assert pipe2.state.watermarks  # resumed from persisted state
    pipe2.run_available_now()

    pet = spark.read.parquet(str(tmp_path / "state/tables/flvdb/pet"))
    assert pet.columns == PET_COLUMNS
    rows = sorted(
        (r.name, r.owner, r.species, r.sex, str(r.birth) if r.birth else None,
         str(r.last_vaccine) if r.last_vaccine else None)
        for r in pet.collect()
    )
    assert rows == sorted(PET_GOLDEN)

    # registry persisted with types
    assert pipe2.state.registry.get_columns("flvdb", "pet") == PET_COLUMNS


def test_stream_filters_exclude_db(spark, tmp_path):
    _write_events(tmp_path, "events-0.jsonl", PET_EVENTS)
    profile = _profile(tmp_path, filters=Filters(exclude_dbs=("flvdb",)))
    pipe = CdcPipeline(spark, profile)
    pipe.run_available_now()
    # db excluded → no pet table materialized
    assert ("flvdb", "pet") not in pipe.state.tables


def test_pipeline_jvm_decode_end_to_end(spark, tmp_path):
    """The jvm_decode profile flag runs the whole CDC pipeline through
    the pure-JVM from_json decoder — final tables must equal the
    default (Arrow) decode run."""
    from fluvio_demo_apps_rust_spark.config import PipelineProfile
    from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS
    from fluvio_demo_apps_rust_spark.streaming.pipeline import CdcPipeline

    results = {}
    for label, flag in (("arrow", False), ("jvm", True)):
        base = tmp_path / label
        (base / "src").mkdir(parents=True)
        (base / "src" / "events.jsonl").write_text("\n".join(PET_EVENTS) + "\n")
        profile = PipelineProfile(
            source_path=str(base / "src"),
            checkpoint_path=str(base / "ckpt"),
            state_path=str(base / "state"),
            jvm_decode=flag,
        )
        CdcPipeline(spark, profile).run_available_now()
        pet = spark.read.parquet(str(base / "state" / "tables" / "flvdb" / "pet"))
        results[label] = sorted(
            tuple(str(v) for v in row) for row in pet.collect()
        )
    assert results["arrow"] == results["jvm"]
    assert len(results["arrow"]) == 2  # golden pet table
