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
from ..config import KafkaConfig


def read_events(spark: SparkSession, path: str, jvm_decode: bool = False) -> DataFrame:
    """Batch read: directory (or file) of JSON-lines events → normalized."""
    return parse_events(spark.read.text(str(path)), jvm=jvm_decode)


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
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    jvm_decode: bool = False,
) -> DataFrame:
    """Streaming read of a JSON-lines event directory.

    ``maxFilesPerTrigger`` is the admission-control analog of the
    reference's bounded(100) channels (producer.rs:21). ``jvm_decode``
    selects the pure-JVM from_json decoder for deployments where
    Python worker slots are the bottleneck (codec.parse_events).
    """
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_events(reader.text(str(path)), jvm=jvm_decode)


def stream_events_kafka(
    spark: SparkSession, kafka: KafkaConfig, jvm_decode: bool = False
) -> DataFrame:
    """Topic source (S5) over a real broker: the reference consumes the
    fluvio topic from a stored offset (consumer.rs:60-75); here the
    Kafka source + checkpointLocation carries the offset/resume state.
    Same normalized output as the file source — the rest of the
    pipeline is transport-agnostic.

    Requires the spark-sql-kafka connector on the classpath (ship with
    ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``);
    construction is pure, the classpath is only consulted at load.
    """
    if not kafka.enabled:
        raise ValueError("KafkaConfig needs bootstrap_servers and topic")
    reader = spark.readStream.format("kafka")
    for k, v in kafka.source_options().items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # connector jar absent → actionable message
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka-0-10 package on "
            "the Spark classpath (--packages org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<spark-version>)"
        ) from e
    return parse_events(raw.selectExpr("CAST(value AS STRING) AS value"), jvm=jvm_decode)
