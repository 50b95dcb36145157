"""Custom stateful operator (applyInPandasWithState): per-table CDC
stats accumulate across microbatches AND across query restarts (state
restored from the checkpoint)."""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS
from fluvio_demo_apps_rust_spark.sources.event_source import (
    read_events_from_strings,
    stream_events,
)
from fluvio_demo_apps_rust_spark.streaming.stateful import table_stats_stream


def _run(spark, src: Path, ckpt: Path, out: Path):
    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            str(out)
        )

    q = (
        table_stats_stream(stream_events(spark, str(src)))
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(str(out)).collect()
    latest = {}
    for r in sorted(rows, key=lambda r: r.batch_id):
        latest[(r.db, r.table)] = (r.n_events, r.n_rows, r.max_sequence)
    return latest


def _expected(spark, lines):
    row = (
        read_events_from_strings(spark, lines)
        .filter(F.col("table").isNotNull())
        .agg(
            F.count(F.lit(1)).alias("e"),
            F.sum(F.size("rows")).alias("r"),
            F.max("sequence").alias("s"),
        )
        .collect()[0]
    )
    return (row.e, row.r, row.s)


def test_table_stats_accumulate_across_restarts(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    src.mkdir()

    (src / "b1.jsonl").write_text("\n".join(PET_EVENTS[:5]) + "\n")
    got1 = _run(spark, src, ckpt, tmp_path / "out")
    assert got1[("flvdb", "pet")] == _expected(spark, PET_EVENTS[:5])

    # second batch through a RESTARTED query: per-key state must be
    # restored from the checkpoint, so stats are cumulative
    (src / "b2.jsonl").write_text("\n".join(PET_EVENTS[5:]) + "\n")
    got2 = _run(spark, src, ckpt, tmp_path / "out")
    assert got2[("flvdb", "pet")] == _expected(spark, PET_EVENTS)
