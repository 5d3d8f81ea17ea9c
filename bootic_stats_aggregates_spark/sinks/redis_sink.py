"""Redis sink (SURVEY.md §2.1 snk_redis_hash / snk_redis_zset).

The reference daemon's entire output surface is incremental Redis updates:
time-bucketed counter hashes (HINCRBY), ranking sorted sets (ZINCRBY) and
unique-visitor sets (SADD) — SURVEY.md §2.1 ``[REF⟂ tracker.go]``
(reconstructed; /root/reference empty, SURVEY.md §0).

Spark-first split:

1. **Command generation is a dataflow** (`counter_commands` /
   `ranking_commands` / `unique_commands`): micro-batch DataFrame ->
   aggregated (cmd, key, field/member, delta) rows. Pure, deterministic,
   oracle-checkable — and it does the heavy lifting (the shuffle) in Spark,
   so Redis receives ONE increment per (key, field) per batch instead of
   one per event. That per-batch combine is what makes the sink survive
   100 TB: Redis traffic scales with |groups|, not |events|.
2. **The writer is a thin pipelined apply** (`RedisCounterSink`):
   ``foreachBatch`` -> ``foreachPartition`` -> pipelined client commands,
   idempotent via a per-batch marker key (SETNX batch guard) so micro-batch
   retries don't double-count — the exactly-once upgrade over the
   reference's at-least-once socket consumption.

No redis server (or client lib) ships in this container: the import is
gated and `FakeRedis` implements the tiny command subset for tests and for
the oracle-checked `stream_redis_counters` query.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - redis-py is not installed in this container
    import redis as _redis
except ImportError:  # pragma: no cover
    _redis = None

KEY_PREFIX = "stats"
BUCKET_FMT = "yyyy:MM:dd:HH"  # the reference's {y}:{m}:{d}[:{h}] key schema


def counter_commands(events: DataFrame) -> DataFrame:
    """Events -> HINCRBY command rows, one per (type, hour bucket, field).

    Two fields per bucket hash: ``n`` (event count) and ``cents`` (value
    sum in integer cents — exact, mergeable, no float drift in Redis).
    """
    bucket_key = F.concat_ws(
        ":",
        F.lit(KEY_PREFIX),
        F.col("event_type"),
        F.date_format("ts", BUCKET_FMT),
    )
    agg = events.groupBy(bucket_key.alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    n_rows = agg.select(
        F.lit("HINCRBY").alias("cmd"),
        "key",
        F.lit("n").alias("field"),
        F.col("n").alias("delta"),
    )
    cents_rows = agg.select(
        F.lit("HINCRBY").alias("cmd"),
        "key",
        F.lit("cents").alias("field"),
        F.col("cents").alias("delta"),
    )
    return n_rows.unionByName(cents_rows)


def ranking_commands(events: DataFrame) -> DataFrame:
    """Events -> ZINCRBY command rows for per-type user rankings."""
    agg = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("delta")
    )
    return agg.select(
        F.lit("ZINCRBY").alias("cmd"),
        F.concat_ws(":", F.lit("top_users"), F.col("event_type")).alias("key"),
        F.col("user_id").cast("string").alias("member"),
        "delta",
    )


def unique_commands(events: DataFrame) -> DataFrame:
    """Events -> SADD command rows for per-(type, day) unique visitors.

    Deduplicated in Spark first — SADD traffic is |distinct users per
    bucket|, not |events|. (The HLL variant would be PFADD with identical
    shape.)
    """
    day_key = F.concat_ws(
        ":",
        F.lit("uniq"),
        F.col("event_type"),
        F.date_format("ts", "yyyy:MM:dd"),
    )
    return (
        events.select(
            F.lit("SADD").alias("cmd"),
            day_key.alias("key"),
            F.col("user_id").cast("string").alias("member"),
        )
        .distinct()
    )


class FakeRedis:
    """In-memory stand-in implementing the command subset the sink needs."""

    def __init__(self) -> None:
        self.hashes: dict[str, dict[str, int]] = defaultdict(dict)
        self.zsets: dict[str, dict[str, float]] = defaultdict(dict)
        self.sets: dict[str, set[str]] = defaultdict(set)
        self.markers: set[str] = set()

    def hincrby(self, key: str, field: str, delta: int) -> int:
        h = self.hashes[key]
        h[field] = h.get(field, 0) + int(delta)
        return h[field]

    def zincrby(self, key: str, delta: float, member: str) -> float:
        z = self.zsets[key]
        z[member] = z.get(member, 0.0) + float(delta)
        return z[member]

    def sadd(self, key: str, member: str) -> int:
        before = len(self.sets[key])
        self.sets[key].add(member)
        return len(self.sets[key]) - before

    def set_marker(self, marker: str) -> bool:
        """SETNX-style batch guard: False if already applied."""
        if marker in self.markers:
            return False
        self.markers.add(marker)
        return True


def apply_commands(client, rows) -> int:
    """Apply command rows (HINCRBY/ZINCRBY/SADD) to a client. Returns the
    number of commands applied. Works for FakeRedis and redis-py alike."""
    n = 0
    for r in rows:
        if r.cmd == "HINCRBY":
            client.hincrby(r.key, r.field, r.delta)
        elif r.cmd == "ZINCRBY":
            client.zincrby(r.key, r.delta, r.member)
        elif r.cmd == "SADD":
            client.sadd(r.key, r.member)
        else:  # pragma: no cover - unknown command is a programming error
            raise ValueError(f"unknown command {r.cmd!r}")
        n += 1
    return n


class RedisCounterSink:
    """foreachBatch sink: per-batch combined commands, pipelined, idempotent.

    ``client_factory`` is called once per partition on the executor (a real
    deployment passes a redis-py connection-pool factory; tests pass
    FakeRedis). The per-batch marker makes retried micro-batches no-ops.
    """

    def __init__(self, client_factory, namespace: str = "bootic") -> None:
        self._factory = client_factory
        self._ns = namespace

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        client = self._factory()
        if hasattr(client, "set_marker"):
            fresh = client.set_marker(f"{self._ns}:batch:{batch_id}")
        else:  # redis-py: NX set as the idempotence guard
            fresh = bool(client.set(f"{self._ns}:batch:{batch_id}", 1, nx=True))
        if not fresh:
            return
        commands = [
            counter_commands(batch_df),
            ranking_commands(batch_df),
            unique_commands(batch_df),
        ]
        if _redis is not None and not isinstance(client, FakeRedis):
            # production path: ship per partition, pipeline per partition
            factory = self._factory

            def _write(rows):  # pragma: no cover - needs a redis server
                c = factory()
                pipe = c.pipeline(transaction=False)
                apply_commands(pipe, rows)
                pipe.execute()

            for cdf in commands:
                cdf.foreachPartition(_write)
        else:
            # test path: command volume is |groups|, safe to collect
            for cdf in commands:
                apply_commands(client, cdf.toLocalIterator())
