"""Streaming infrastructure: sources, deterministic test execution.

Production shape (SURVEY.md §3.2 EP3): ``readStream`` (Kafka in prod — the
ZMQ funnel's Spark-native equivalent) -> incremental plan per micro-batch ->
state store -> sink. For the driver harness everything runs deterministically:
the same event rows stream from the fixture parquet with
``Trigger.AvailableNow`` into a memory sink, so a streaming query returns a
plain DataFrame comparable against a DuckDB oracle (streaming==batch
equivalence, SURVEY.md §5.2 item 3).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..session import tune

_STAGE_ROOT = "/tmp/bootic_stream_src"


def _as_stream_dir(sf_dir: str, name: str) -> str:
    """File-stream sources need a *directory*; stage a symlink to the
    fixture parquet once per (sf_dir, table)."""
    key = f"{sf_dir.strip('/').replace('/', '_')}__{name}"
    d = os.path.join(_STAGE_ROOT, key)
    target = os.path.join(d, f"{name}.parquet")
    if not os.path.exists(target):
        os.makedirs(d, exist_ok=True)
        try:
            os.symlink(os.path.join(sf_dir, f"{name}.parquet"), target)
        except FileExistsError:  # pragma: no cover - concurrent staging
            pass
    return d


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Unbounded view of a fixture table (the ZMQ-funnel analog).

    Uses the batch reader's schema (incl. the nanosAsLong long for
    events.ts) and applies the same ns->us conversion as io.table().
    """
    tune(spark)
    raw_schema = spark.read.parquet(
        os.path.join(sf_dir, f"{name}.parquet")
    ).schema
    df = (
        spark.readStream.schema(raw_schema)
        .parquet(_as_stream_dir(sf_dir, name))
    )
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def run_to_memory(
    result: DataFrame, *, mode: str = "complete", await_seconds: int = 300
) -> DataFrame:
    """Execute a streaming DataFrame to completion; return the sink table.

    ``Trigger.AvailableNow`` processes everything currently available then
    stops — the deterministic harness analog of a forever-running job.
    """
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bootic_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(await_seconds):  # pragma: no cover - hang guard
        q.stop()
        raise TimeoutError(f"streaming query {name} exceeded {await_seconds}s")
    spark = result.sparkSession
    return spark.table(name)


def run_foreach_batch(
    result: DataFrame, fn, *, mode: str = "update", await_seconds: int = 300
) -> None:
    """Execute a streaming DataFrame through a foreachBatch sink."""
    q = (
        result.writeStream.foreachBatch(fn)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bootic_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(await_seconds):  # pragma: no cover - hang guard
        q.stop()
        raise TimeoutError(f"foreachBatch stream exceeded {await_seconds}s")


def batch_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch twin of stream_table (for streaming==batch equivalence)."""
    return table(spark, sf_dir, name)
