"""Change-event sources (operators S1-S5, Spark-first).

The reference's producer tails binlog files with an mtime poll loop and
offset bookkeeping (manager.rs:53-96); in Spark all of that — new-file
discovery, incremental offsets, resume-on-restart — is the file
source + checkpoint. The "topic" (S5) is a directory of JSON-lines
event files; a Kafka source drops in by swapping ``format``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..codec import parse_events


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch read: directory (or file) of JSON-lines events → normalized."""
    return parse_events(spark.read.text(str(path)))


def read_events_from_strings(spark: SparkSession, lines: list[str]) -> DataFrame:
    """Normalize an in-memory list of event JSON strings (tests/demos).

    Partition count scales with the batch (1 partition per ~1k events)
    so tiny batches don't fan out into defaultParallelism near-empty
    tasks at every downstream fold step.
    """
    n = max(1, min(len(lines) // 1000 + 1, spark.sparkContext.defaultParallelism))
    rdd = spark.sparkContext.parallelize([(s,) for s in lines], n)
    df = spark.createDataFrame(rdd, "value string")
    return parse_events(df)


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of a JSON-lines event directory.

    ``maxFilesPerTrigger`` is the admission-control analog of the
    reference's bounded(100) channels (producer.rs:21).
    """
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_events(reader.text(str(path)))
