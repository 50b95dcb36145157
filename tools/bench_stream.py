#!/usr/bin/env python
"""Streaming-throughput benchmark for the CDC pipeline (r10 verdict #4).

The reference's core capability is binlog replication; its pacing
constants are a 500 ms poll floor (cdc-mysql manager.rs:22) and
bounded(100) channels (producer.rs:21) — i.e. a design ceiling of
~200 msgs/sec per poll loop if every poll returns a full channel.
This tool measures what the Spark pipeline actually sustains on the
same event volume cdc_orders_roundtrip uses: every orders row at the
given SF rendered as a wire-format Add event (plans/cdc.py
orders_wire_events — the SAME renderer the batch query uses), written
to a JSON-lines "topic" directory, then drained end-to-end through

    readStream(text) -> codec.parse_events -> BEGIN-skip -> db filter
      -> foreachBatch: sequence-sort -> apply_changes -> persist state

with trigger(availableNow=True) and a checkpointLocation — the full
CdcPipeline (streaming/pipeline.py), not a stripped-down path. The
applied replica table is row-count-verified against the source before
any number is reported.

Variants:
  - python_codec: default decode path (Arrow mapInPandas decoder)
  - jvm_codec:    pure-JVM from_json decode (profile.jvm_decode)
  - paced_8_files: jvm decode + maxFilesPerTrigger=8 over 32 source
    files (4 micro-batches) — surfaces per-micro-batch overhead, the
    analog of the reference's bounded-channel pacing.

Prints ONE JSON line:
  {"metric": "cdc stream apply throughput", "sf": .., "events": N,
   "variants": {name: {"wall_sec": t, "events_per_sec": r,
                        "applied_rows": n}}}

Fixture rendering/writing happens before the clock starts; each
variant gets fresh checkpoint/state dirs (cold stream, warm JVM).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fluvio_demo_apps_rust_spark.config import PipelineProfile
from fluvio_demo_apps_rust_spark.plans.cdc import ORDERS_DDL_EVENT, orders_wire_events
from fluvio_demo_apps_rust_spark.session import get_spark
from fluvio_demo_apps_rust_spark.streaming.pipeline import CdcPipeline


VARIANTS: dict[str, dict] = {
    "python_codec": {},
    "jvm_codec": {"jvm_decode": True},
    "paced_8_files": {"jvm_decode": True, "max_files_per_trigger": 8},
}


def measure(spark, sf_dir: str, variants: dict[str, dict] | None = None) -> dict:
    """Build the topic fixture, drain it through the full CdcPipeline
    once per variant, verify the applied replica row count, and return
    the result dict (see module docstring). Separated from main() so
    tests can pin the fixture-ordering semantics at sf0.001."""
    variants = VARIANTS if variants is None else variants
    work = Path(tempfile.mkdtemp(prefix="bench_stream_"))
    try:
        # ---- fixture: the topic directory (NOT timed) ------------------
        # The file source admits oldest-mtime first: the DDL must be the
        # OLDEST file in the topic or a paced (maxFilesPerTrigger) run
        # drops every Add that precedes its table registration. Write it
        # first and back-date it a minute (well inside the 7-day
        # maxFileAge window of the part files — see CLAUDE.md). For the
        # paced variant the part files are range-partitioned on the
        # order key and given strictly increasing mtimes, so cross-
        # micro-batch admission is sequence-monotone — the ordering
        # guarantee a real topic provides, without which the per-table
        # sequence watermark (F4) correctly drops out-of-order files.
        topic = work / "topic"
        topic.mkdir()
        ddl_file = topic / "00000-ddl.jsonl"
        ddl_file.write_text(ORDERS_DDL_EVENT + "\n")
        t_ddl = time.time() - 60
        os.utime(ddl_file, (t_ddl, t_ddl))
        orders_wire_events(spark, sf_dir, ordered=True).write.mode("append").text(
            str(topic)
        )
        parts = sorted(
            f
            for f in topic.glob("part-*.txt")
            if not f.name.endswith(".crc")
        )
        base = time.time() - 50
        for i, f in enumerate(parts):  # part-00000 holds the lowest keys
            os.utime(f, (base + i, base + i))
        n_events = sum(
            1
            for f in topic.glob("*")
            if f.suffix != ".crc" and not f.name.startswith(("_", "."))
            for _ in f.open()
        )

        out: dict[str, dict[str, float]] = {}
        for name, kw in variants.items():
            vdir = work / name
            profile = PipelineProfile(
                source_path=str(topic),
                checkpoint_path=str(vdir / "ckpt"),
                state_path=str(vdir / "state"),
                **kw,
            )
            pipe = CdcPipeline(spark, profile)
            t0 = time.perf_counter()
            pipe.run_available_now()
            wall = time.perf_counter() - t0
            applied = spark.read.parquet(
                str(vdir / "state/tables/cdcdb/orders_r")
            ).count()
            if applied != n_events - 1:  # every Add row landed (minus DDL)
                raise AssertionError(
                    f"{name}: applied {applied} rows, expected {n_events - 1}"
                )
            out[name] = {
                "wall_sec": round(wall, 3),
                "events_per_sec": round(n_events / wall, 1),
                "applied_rows": applied,
            }
        return {
            "metric": "cdc stream apply throughput "
            "(readStream->codec->filter->foreachBatch apply, availableNow)",
            "events": n_events,
            "variants": out,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench-stream")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # JVM warm
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()  # Python worker warm
    result = measure(spark, sf_dir)
    result["sf"] = sf
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
