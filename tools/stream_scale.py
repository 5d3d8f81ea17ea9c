#!/usr/bin/env python
"""Sustained streaming-throughput measurement (README "Streaming scaling").

The per-sample bench number (stream_rollup_e2e) carries Structured
Streaming's fixed per-query cost — planning, state-store spin-up, WAL
commits — which a forever-running job pays once, not per batch. This tool
measures the number that matters at daemon scale: events/second through
the full ingest -> event-time tumbling rollup -> sink pipeline once the
fixed cost is amortized, by staging the events fixture N times into a
file-stream source directory.

Usage: python tools/stream_scale.py [replications ...]  (default 1 10 100)
Prints one JSON line per replication factor.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STAGE_ROOT = "/tmp/bootic_stream_scale"


def stage(n: int) -> str:
    d = os.path.join(STAGE_ROOT, f"x{n}")
    if not os.path.exists(os.path.join(d, "_STAGED")):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        src = os.path.join(SF_DIR, "events.parquet")
        for i in range(n):
            os.symlink(src, os.path.join(d, f"events_{i:04d}.parquet"))
        open(os.path.join(d, "_STAGED"), "w").close()
    return d


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_CKPT_DIR", "/dev/shm/bootic_ckpt")

    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.session import get_spark, tune
    from bootic_stats_aggregates_spark.streaming.runner import _ckpt_dir

    spark = get_spark("stream-scale")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)

    raw_schema = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).schema
    base_rows = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).count()

    for n in reps:
        d = stage(n)
        ev = (
            spark.readStream.schema(raw_schema)
            .parquet(d)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
        agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("user_id").alias("uniq"),
        )
        name = "scale_" + uuid.uuid4().hex[:8]
        t0 = time.perf_counter()
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", _ckpt_dir())
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(1800):
            q.stop()
            raise TimeoutError(f"x{n} run exceeded 30 min")
        wall = time.perf_counter() - t0
        n_events = base_rows * n
        print(
            json.dumps(
                {
                    "replication": n,
                    "events": n_events,
                    "wall_sec": round(wall, 2),
                    "events_per_sec": round(n_events / wall),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
