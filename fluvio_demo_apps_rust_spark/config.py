"""Producer/consumer profiles and db filters.

Reference: TOML profiles (cdc-mysql/src/producer/profile.rs:55-98,
consumer/profile.rs:51-99) with an untagged Filters enum — EITHER
``include_dbs`` OR ``exclude_dbs``, names lowercased at load
(profile.rs:70-92). Fluvio topic/offset-file knobs map onto Spark
source paths and checkpointLocation.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from pathlib import Path


class ConfigError(Exception):
    pass


@dataclass(frozen=True)
class Filters:
    include_dbs: tuple[str, ...] = ()
    exclude_dbs: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if self.include_dbs and self.exclude_dbs:
            raise ConfigError("filters: include_dbs and exclude_dbs are mutually exclusive")
        object.__setattr__(self, "include_dbs", tuple(d.lower() for d in self.include_dbs))
        object.__setattr__(self, "exclude_dbs", tuple(d.lower() for d in self.exclude_dbs))

    def allows(self, db: str | None, drop_no_db: bool = False) -> bool:
        """Producer semantics: events with no db pass (binlog_parser.rs:
        232-265); consumer drops them (mysql_manager.rs:375-391) —
        select with ``drop_no_db``."""
        if db is None or db == "":
            return not drop_no_db
        db = db.lower()
        if self.include_dbs:
            return db in self.include_dbs
        if self.exclude_dbs:
            return db not in self.exclude_dbs
        return True


@dataclass(frozen=True)
class KafkaConfig:
    """Real topic transport (S5 source / K1 sink) — the Spark analog of
    the reference's streaming-platform client (fluvio_manager.rs:13-52,
    consumer.rs:60-75). Enabled when both broker and topic are set; the
    file-directory "topic" stays the default (and the only option in a
    broker-less sandbox). Requires the spark-sql-kafka package on the
    session classpath at stream start."""

    bootstrap_servers: str = ""
    topic: str = ""
    starting_offsets: str = "earliest"   # resume default; checkpoint overrides
    extra: tuple[tuple[str, str], ...] = ()  # passthrough kafka.* options

    @property
    def enabled(self) -> bool:
        return bool(self.bootstrap_servers and self.topic)

    def source_options(self) -> dict[str, str]:
        """readStream.format("kafka") options (subscribe side)."""
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
            **dict(self.extra),
        }

    def sink_options(self) -> dict[str, str]:
        """writeStream.format("kafka") options (publish side)."""
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
            **dict(self.extra),
        }


@dataclass
class PipelineProfile:
    """Unified producer/consumer profile for the Spark pipeline."""

    resource_name: str = "mysql-srv1"
    source_path: str = ""           # event-JSON directory (the "topic")
    checkpoint_path: str = ""       # Spark checkpointLocation (offset/resume state)
    state_path: str = ""            # materialized tables + registry + watermarks
    filters: Filters = field(default_factory=Filters)
    trigger_ms: int = 500           # reference poll floor: manager.rs:22
    max_files_per_trigger: int | None = None  # backpressure (channel cap analog)
    jvm_decode: bool = False        # pure-JVM from_json decoder (no Python workers)
    strict_ddl: bool = False        # raise on unsupported DDL (reference ignores)
    scd2_history: bool = False      # maintain SCD2 version tables per replica table
    kafka: KafkaConfig = field(default_factory=KafkaConfig)

    @classmethod
    def load(cls, path: str | Path) -> "PipelineProfile":
        raw = tomllib.loads(Path(path).expanduser().read_text())
        filters = raw.get("filters", {})
        if "include_dbs" in filters and "exclude_dbs" in filters:
            raise ConfigError("filters: include_dbs and exclude_dbs are mutually exclusive")
        data = raw.get("data", {})
        fluvio = raw.get("fluvio", {})
        kafka = raw.get("kafka", {})
        return cls(
            kafka=KafkaConfig(
                bootstrap_servers=kafka.get("bootstrap_servers", ""),
                topic=kafka.get("topic", ""),
                starting_offsets=kafka.get("starting_offsets", "earliest"),
                extra=tuple(sorted(kafka.get("options", {}).items())),
            ),
            resource_name=raw.get("mysql_resource_name", "mysql-srv1"),
            source_path=str(Path(data.get("base_path", "")).expanduser()),
            checkpoint_path=str(Path(data.get("checkpoint_path", "")).expanduser()),
            state_path=str(Path(data.get("state_path", "")).expanduser()),
            filters=Filters(
                include_dbs=tuple(filters.get("include_dbs", ())),
                exclude_dbs=tuple(filters.get("exclude_dbs", ())),
            ),
            trigger_ms=int(raw.get("trigger_ms", fluvio.get("trigger_ms", 500))),
            max_files_per_trigger=raw.get("max_files_per_trigger"),
            jvm_decode=bool(raw.get("jvm_decode", False)),
            strict_ddl=bool(raw.get("strict_ddl", False)),
            scd2_history=bool(raw.get("scd2_history", False)),
        )
