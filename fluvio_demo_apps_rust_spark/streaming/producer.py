"""Producer-side CDC pipeline (SURVEY §3.1), Spark-first.

The reference's producer tails binlog files, filters, assigns a
monotonic sequence, and publishes JSON events to a single-partition
topic (src/bin/producer.rs:11-75, fluvio_manager.rs:43-52). Here the
topology is one Structured Streaming query:

    stream_events(binlog dir)        # S1-S4: discovery/offsets free
      → skip BEGIN markers (F3)
      → producer db filter (F1: events with no db PASS)
      → foreachBatch:
          assign dense sequence from the persisted high-watermark
          (T4 done right — survives restarts, unlike the reference's
          restart-from-0, fluvio_manager.rs:49)
          → render wire JSON → append to the topic dir (K1)
          → persist the new high-watermark (T5 analog)
      with checkpointLocation         # resume file: free

The "topic" is a directory of JSON-lines files; total order is carried
by the embedded sequence (the consumer sorts), so the sink itself
needs no ordering guarantee — the Spark analog of the reference's
single-partition publish.

Scale note: sequence assignment is one ordered shuffle per microbatch
(see operators/sequence.py); everything else is narrow. At scale you
run one producer per source database, as the reference does.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..codec import render_events
from ..config import Filters, KafkaConfig
from ..operators.filters import db_filter, skip_begin_statements
from ..operators.sequence import assign_sequence
from ..sources.event_source import stream_events


def kafka_topic_writer(rendered: DataFrame, kafka: KafkaConfig, checkpoint_path: str):
    """K1 over a real broker: writeStream.format("kafka") builder for
    rendered wire events — the Spark analog of the reference's
    single-partition publish (fluvio_manager.rs:13-52). Construction is
    pure; the connector jar is consulted at start(). Total order is
    carried by the embedded sequence, so no partitioner is needed."""
    if not kafka.enabled:
        raise ValueError("KafkaConfig needs bootstrap_servers and topic")
    writer = rendered.writeStream.format("kafka")
    for k, v in kafka.sink_options().items():
        writer = writer.option(k, v)
    return writer.option("checkpointLocation", checkpoint_path)


class CdcProducer:
    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        topic_path: str,
        state_path: str,
        checkpoint_path: str,
        filters: Filters | None = None,
        kafka: KafkaConfig | None = None,
    ) -> None:
        self.spark = spark
        self.source_path = source_path
        self.topic_path = topic_path
        self.state_file = Path(state_path) / "sequence_hwm.json"
        self.checkpoint_path = checkpoint_path
        self.filters = filters or Filters()
        # Kafka publish (K1 real transport) when configured; the
        # JSON-lines topic dir remains the broker-less default.
        self.kafka = kafka if kafka is not None and kafka.enabled else None
        self.hwm = self._load_hwm()

    def _load_hwm(self) -> int:
        if self.state_file.exists():
            return int(json.loads(self.state_file.read_text())["hwm"])
        return self._recover_hwm_from_topic()

    def _recover_hwm_from_topic(self) -> int:
        """S6 (topic tail probe) done right: when the high-watermark
        file is lost, recover the next sequence from the max published
        one. The reference defines this path but never calls it and
        restarts sequences at 0 (fluvio_manager.rs:56-77 dead code,
        :49); here it is the actual fallback."""
        if not Path(self.topic_path).exists():
            return -1
        import pyspark.sql.functions as F

        df = self.spark.read.text(self.topic_path)
        row = df.agg(
            F.max(F.get_json_object("value", "$.sequence").cast("long"))
        ).collect()[0]
        return int(row[0]) if row[0] is not None else -1

    def _save_hwm(self) -> None:
        self.state_file.parent.mkdir(parents=True, exist_ok=True)
        self.state_file.write_text(json.dumps({"hwm": self.hwm}))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        events = skip_begin_statements(batch_df)
        # Producer filter semantics (F1): events with no db pass.
        events = db_filter(events, self.filters, drop_no_db=False)
        seqd = assign_sequence(events.drop("sequence"), start=self.hwm + 1)
        rendered = render_events(seqd).persist()
        n = rendered.count()
        if n:
            if self.kafka is not None:
                (
                    rendered.write.format("kafka")
                    .options(**self.kafka.sink_options())
                    .save()
                )
            else:
                rendered.write.mode("append").text(self.topic_path)
            self.hwm += n
            self._save_hwm()
        rendered.unpersist()

    def run_available_now(self) -> None:
        q = (
            stream_events(self.spark, self.source_path)
            .writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
