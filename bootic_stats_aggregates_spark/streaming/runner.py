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

from ..io import normalize_ts, table
from ..session import tune

_STAGE_ROOT = "/tmp/bootic_stream_src"


def _ckpt_dir() -> str:
    """Fresh checkpoint dir for one harness run.

    ``SPARK_GRAFT_CKPT_DIR`` overrides the root — bench.py points it at
    tmpfs (/dev/shm) because checkpoint commits are fsync-heavy small files
    and the memory-sink harness is non-durable anyway. Production jobs set
    their own ``checkpointLocation`` on durable storage; this knob only
    affects the deterministic test/bench path."""
    root = os.environ.get("SPARK_GRAFT_CKPT_DIR")
    if root:
        os.makedirs(root, exist_ok=True)
        return tempfile.mkdtemp(prefix="bootic_ckpt_", dir=root)
    return tempfile.mkdtemp(prefix="bootic_ckpt_")


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


def _fixture_schema(spark: SparkSession, sf_dir: str, name: str):
    """Raw parquet schema of a fixture table (events.ts in whatever form
    this Spark build surfaces parquet NANOS as — long or TIMESTAMP_NTZ) —
    shared by every transport so parsed rows are byte-identical regardless
    of how they arrived."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")).schema


def _convert_event_ts(df: DataFrame, name: str) -> DataFrame:
    """Same ns-column normalization as io.table(), applied post-ingest.

    Schema-aware (long / TIMESTAMP_NTZ / TIMESTAMP) so the streaming
    transports keep working across Spark builds that changed how parquet
    TIMESTAMP(NANOS) is surfaced (see io._NANOS_COLS)."""
    if name == "events":
        df = normalize_ts(df, "ts")
    return df


def kafka_stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    bootstrap: str | None = None,
    topic: str | None = None,
) -> DataFrame:
    """Kafka transport for the event stream (VERDICT r2 item 6).

    The reference daemon ingests over a message bus (ZMQ `[REF⟂ main.go]`);
    Spark's production equivalent is the Kafka source. Requires a broker and
    the spark-sql-kafka connector on the classpath — neither exists in this
    sandbox, so the path is gated behind ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` and
    exercised by a skip-marked test that documents the required env.

    Message contract: one JSON object per Kafka record value, fields exactly
    the fixture table's columns (events.ts as epoch-nanos long, matching the
    parquet fixture). Rows parse through the same schema and ns->us
    conversion as the file transport, so every downstream streaming query is
    transport-agnostic.

    Scale notes: ``maxOffsetsPerTrigger`` (env
    ``SPARK_GRAFT_KAFKA_MAX_OFFSETS``) bounds per-micro-batch intake so a
    backlog replay cannot blow state-store memory; partitions map 1:1 to
    Kafka partitions, so parallelism is set by the topic, not the engine.
    """
    bootstrap = bootstrap or os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if not bootstrap:
        raise RuntimeError(
            "kafka transport requires SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port "
            "(and optionally SPARK_GRAFT_KAFKA_TOPIC, default bootic.<table>)"
        )
    topic = topic or os.environ.get("SPARK_GRAFT_KAFKA_TOPIC", f"bootic.{name}")
    tune(spark)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", os.environ.get("SPARK_GRAFT_KAFKA_OFFSETS", "earliest"))
    )
    max_offsets = os.environ.get("SPARK_GRAFT_KAFKA_MAX_OFFSETS")
    if max_offsets:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets)
    raw = reader.load()
    parsed = raw.select(
        F.from_json(
            F.col("value").cast("string"), _fixture_schema(spark, sf_dir, name)
        ).alias("e")
    ).select("e.*")
    return _convert_event_ts(parsed, name)


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Unbounded view of a fixture table (the ZMQ-funnel analog).

    Transport is selected by ``SPARK_GRAFT_STREAM_TRANSPORT``: ``files``
    (default — deterministic fixture replay for the driver harness) or
    ``kafka`` (production bus; see :func:`kafka_stream_table`). Every
    registered streaming query goes through this dispatcher, so flipping the
    env var moves the whole streaming surface onto the bus unchanged.
    """
    if os.environ.get("SPARK_GRAFT_STREAM_TRANSPORT", "files") == "kafka":
        return kafka_stream_table(spark, sf_dir, name)
    tune(spark)
    df = (
        spark.readStream.schema(_fixture_schema(spark, sf_dir, name))
        .parquet(_as_stream_dir(sf_dir, name))
    )
    return _convert_event_ts(df, name)


def run_to_memory(
    result: DataFrame,
    *,
    mode: str = "complete",
    await_seconds: int = 300,
    progress_sink: list | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion; return the sink table.

    ``Trigger.AvailableNow`` processes everything currently available then
    stops — the deterministic harness analog of a forever-running job.
    ``progress_sink``, when given, receives the query's recentProgress
    dicts after termination — the state-store/watermark metrics tests
    (e.g. the RocksDB provider assertions) read them from there.
    """
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", _ckpt_dir())
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(await_seconds):  # pragma: no cover - hang guard
        q.stop()
        raise TimeoutError(f"streaming query {name} exceeded {await_seconds}s")
    if progress_sink is not None:
        progress_sink.extend(q.recentProgress)
    spark = result.sparkSession
    return spark.table(name)


def run_foreach_batch(
    result: DataFrame, fn, *, mode: str = "update", await_seconds: int = 300
) -> None:
    """Execute a streaming DataFrame through a foreachBatch sink."""
    q = (
        result.writeStream.foreachBatch(fn)
        .outputMode(mode)
        .option("checkpointLocation", _ckpt_dir())
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(await_seconds):  # pragma: no cover - hang guard
        q.stop()
        raise TimeoutError(f"foreachBatch stream exceeded {await_seconds}s")


def batch_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch twin of stream_table (for streaming==batch equivalence)."""
    return table(spark, sf_dir, name)
