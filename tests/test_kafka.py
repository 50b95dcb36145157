"""Kafka transport wiring (S5 source / K1 sink): options construction
and profile plumbing. No broker (and no connector jar) exists in the
sandbox, so these pin the construction layer — the options dicts the
reader/writer are built from, the profile TOML path, and the actionable
error when the connector jar is absent."""

from __future__ import annotations

import pytest

from fluvio_demo_apps_rust_spark.config import KafkaConfig, PipelineProfile


def test_kafka_config_options():
    k = KafkaConfig(
        bootstrap_servers="broker1:9092,broker2:9092",
        topic="cdc-events",
        starting_offsets="latest",
        extra=(("kafka.security.protocol", "SASL_SSL"),),
    )
    assert k.enabled
    assert k.source_options() == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "cdc-events",
        "startingOffsets": "latest",
        "kafka.security.protocol": "SASL_SSL",
    }
    assert k.sink_options() == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "topic": "cdc-events",
        "kafka.security.protocol": "SASL_SSL",
    }


def test_kafka_config_disabled_by_default():
    assert not KafkaConfig().enabled
    assert not KafkaConfig(bootstrap_servers="b:9092").enabled  # topic missing


def test_profile_loads_kafka_section(tmp_path):
    p = tmp_path / "profile.toml"
    p.write_text(
        """
mysql_resource_name = "mysql-srv1"

[data]
base_path = "/tmp/events"

[kafka]
bootstrap_servers = "broker:9092"
topic = "cdc"
starting_offsets = "latest"

[kafka.options]
"kafka.security.protocol" = "PLAINTEXT"
"""
    )
    prof = PipelineProfile.load(p)
    assert prof.kafka.enabled
    assert prof.kafka.source_options()["subscribe"] == "cdc"
    assert prof.kafka.source_options()["startingOffsets"] == "latest"
    assert prof.kafka.sink_options()["kafka.security.protocol"] == "PLAINTEXT"


def test_profile_without_kafka_section_disabled(tmp_path):
    p = tmp_path / "profile.toml"
    p.write_text('[data]\nbase_path = "/tmp/events"\n')
    assert not PipelineProfile.load(p).kafka.enabled


def test_kafka_source_requires_config(spark):
    from fluvio_demo_apps_rust_spark.sources.event_source import stream_events_kafka

    with pytest.raises(ValueError):
        stream_events_kafka(spark, KafkaConfig())


def test_kafka_source_missing_jar_actionable(spark):
    # the sandbox has no spark-sql-kafka connector: load() must fail
    # with a message that names the missing package, not a raw JVM trace
    from fluvio_demo_apps_rust_spark.sources.event_source import stream_events_kafka

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        stream_events_kafka(
            spark, KafkaConfig(bootstrap_servers="b:9092", topic="t")
        )


def test_kafka_writer_builder(spark):
    from fluvio_demo_apps_rust_spark.streaming.producer import kafka_topic_writer

    # a streaming frame with a value column, as render_events emits
    df = spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS STRING) AS value"
    )
    with pytest.raises(ValueError):
        kafka_topic_writer(df, KafkaConfig(), "/tmp/ckpt")
    # construction with a full config is pure (no broker contact)
    w = kafka_topic_writer(
        df, KafkaConfig(bootstrap_servers="b:9092", topic="t"), "/tmp/ckpt"
    )
    assert w is not None
