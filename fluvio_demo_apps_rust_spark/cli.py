"""CLI entry points, mirroring the reference binaries
(src/bin/producer.rs / src/bin/consumer.rs) on the Spark engine:

    python -m fluvio_demo_apps_rust_spark.cli apply <profile.toml>
        stream events → materialized tables (the consumer path,
        table-apply sink), continuous trigger.

    python -m fluvio_demo_apps_rust_spark.cli apply-once <profile.toml>
        same, but drain-and-stop (availableNow) — the batch/test mode.

    python -m fluvio_demo_apps_rust_spark.cli sql-sink <profile.toml> <log>
        stream events → rendered SQL statements appended to <log>
        (the consumer path with the MySQL executor swapped for a file).

    python -m fluvio_demo_apps_rust_spark.cli produce <profile.toml> <topic-dir>
        stream un-sequenced binlog-style events from the profile's
        source → filter → dense sequence → wire-JSON topic directory
        (the producer path, drain-and-stop).
"""

from __future__ import annotations

import sys

from .config import PipelineProfile
from .session import get_spark


_COMMANDS = {"apply": 2, "apply-once": 2, "sql-sink": 3, "produce": 3}


def main(argv: list[str]) -> int:
    # Validate the command and arity BEFORE loading the profile or
    # paying JVM startup, so a typo prints usage, not a traceback.
    if len(argv) < 2 or argv[0] not in _COMMANDS:
        print(__doc__)
        return 2
    cmd, profile_path = argv[0], argv[1]
    if len(argv) < _COMMANDS[cmd]:
        print(f"{cmd} requires {_COMMANDS[cmd] - 1} arguments\n{__doc__}")
        return 2
    profile = PipelineProfile.load(profile_path)
    spark = get_spark(f"cdc-{cmd}")

    if cmd in ("apply", "apply-once"):
        from .streaming.pipeline import CdcPipeline

        pipe = CdcPipeline(spark, profile)
        if cmd == "apply-once":
            pipe.run_available_now()
        else:
            q = pipe.start()
            q.awaitTermination()
        return 0

    if cmd == "sql-sink":
        log_path = argv[2]
        from .sources.event_source import stream_events
        from .streaming.sql_sink import append_statements_batch

        events = stream_events(spark, profile.source_path, profile.max_files_per_trigger)
        q = (
            events.writeStream.foreachBatch(
                lambda batch, _id: append_statements_batch(batch, log_path)
            )
            # per-command checkpoint subdir: sharing the apply query's
            # checkpoint would silently resume from ITS offsets
            .option("checkpointLocation", f"{profile.checkpoint_path}/sql-sink")
            .trigger(processingTime=f"{profile.trigger_ms} milliseconds")
            .start()
        )
        q.awaitTermination()
        return 0

    if cmd == "produce":
        from .streaming.producer import CdcProducer

        CdcProducer(
            spark,
            source_path=profile.source_path,
            topic_path=argv[2],
            state_path=profile.state_path,
            checkpoint_path=f"{profile.checkpoint_path}/produce",
            filters=profile.filters,
            kafka=profile.kafka,  # publish to the broker when configured
        ).run_available_now()
        return 0

    print(f"unknown command: {cmd}\n{__doc__}")
    return 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
