"""Sink operators as registered queries (SURVEY.md §2.1 snk_*).

The command-generation dataflows are deterministic DataFrames, so the sink
logic itself is oracle-checked; `stream_redis_counters` additionally runs
the full streaming pipeline into a FakeRedis and surfaces the final counter
state — end-to-end verification that streamed HINCRBY deltas converge to
the batch truth (micro-batch-split independent, since the deltas are
additive).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..helpers import cents
from ..io import table
from ..registry import query
from ..streaming.runner import run_foreach_batch, stream_table
from .redis_sink import (
    FakeRedis,
    RedisCounterSink,
    counter_commands,
    path_ranking_commands,
    ranking_commands,
    unique_commands,
)

_HASH_ORACLE = """
    WITH agg AS (
      SELECT
        'stats:' || event_type || ':'
          || COALESCE(strftime(ts, '%Y:%m:%d:%H'), '-') AS key,
        CAST(count(*) AS BIGINT) AS n,
        CAST(COALESCE(sum(CAST(round(value * 100) AS BIGINT)), 0) AS BIGINT)
          AS cents
      FROM events
      GROUP BY 1
    )
    SELECT 'HINCRBY' AS cmd, key, 'n' AS field, n AS delta FROM agg
    UNION ALL
    SELECT 'HINCRBY' AS cmd, key, 'cents' AS field, cents AS delta FROM agg
"""


@query("snk_redis_hash", oracle=_HASH_ORACLE)
def snk_redis_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HINCRBY command stream for time-bucketed counter hashes — the
    reference's key fan-out + counter math as a verifiable dataflow."""
    return counter_commands(table(spark, sf_dir, "events"))


@query(
    "snk_redis_zset",
    oracle="""
    SELECT
      'ZINCRBY' AS cmd,
      'top_users:' || event_type AS key,
      COALESCE(CAST(user_id AS VARCHAR), '-') AS member,
      CAST(count(*) AS BIGINT) AS delta
    FROM events
    GROUP BY event_type, user_id
    """,
)
def snk_redis_zset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZINCRBY command stream for per-type user rankings."""
    return ranking_commands(table(spark, sf_dir, "events"))


@query(
    "snk_redis_paths",
    oracle="""
    SELECT
      'ZINCRBY' AS cmd,
      'top_paths:' || event_type || ':'
        || COALESCE(strftime(ts, '%Y:%m:%d'), '-') AS key,
      COALESCE('/p/' || CAST(CAST(json_extract(props, '$.k') AS BIGINT)
                             AS VARCHAR), '-') AS member,
      CAST(count(*) AS BIGINT) AS delta
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def snk_redis_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZINCRBY command stream for per-(type, day) top-page rankings — the
    reference's path/referrer zsets (`[REF⟂ tracker.go]`), parse_url-backed."""
    return path_ranking_commands(table(spark, sf_dir, "events"))


@query(
    "snk_redis_acct",
    oracle="""
    WITH agg AS (
      SELECT
        'stats:' || COALESCE(CAST(user_id % 20 AS VARCHAR), '-') || ':' || event_type
          || ':' || COALESCE(strftime(ts, '%Y:%m:%d:%H'), '-') AS key,
        CAST(count(*) AS BIGINT) AS n,
        CAST(COALESCE(sum(CAST(round(value * 100) AS BIGINT)), 0) AS BIGINT)
          AS cents
      FROM events
      GROUP BY 1
    )
    SELECT 'HINCRBY' AS cmd, key, 'n' AS field, n AS delta FROM agg
    UNION ALL
    SELECT 'HINCRBY' AS cmd, key, 'cents' AS field, cents AS delta FROM agg
    """,
)
def snk_redis_acct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL 4-part key schema `{prefix}:{account}:{type}:
    {bucket}` (SURVEY.md §0.1; VERDICT r1 missing #4). The fixture events
    carry no account column, so a deterministic stand-in (user_id % 20)
    demonstrates the fan-out; a deployment swaps in the real account id —
    the key arithmetic and per-batch combine are identical."""
    ev = table(spark, sf_dir, "events")
    # NULL policy (hostile-fixture sweep r5): concat_ws silently DROPS a
    # NULL segment — leaving a three-part key that corrupts the schema —
    # so the unknown-account bucket is an explicit '-' sentinel; a bucket
    # whose every value is NULL contributes delta 0, not NULL.
    key = F.concat_ws(
        ":",
        F.lit("stats"),
        F.coalesce((F.col("user_id") % 20).cast("string"), F.lit("-")),
        F.col("event_type"),
        # NULL ts -> explicit '-' bucket segment (hostile sweep r7)
        F.coalesce(F.date_format("ts", "yyyy:MM:dd:HH"), F.lit("-")),
    )
    agg = ev.groupBy(key.alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.round(F.col("value") * 100).cast("long")), F.lit(0)
        ).alias("cents"),
    )
    n_rows = agg.select(
        F.lit("HINCRBY").alias("cmd"), "key",
        F.lit("n").alias("field"), F.col("n").alias("delta"),
    )
    cents_rows = agg.select(
        F.lit("HINCRBY").alias("cmd"), "key",
        F.lit("cents").alias("field"), F.col("cents").alias("delta"),
    )
    return n_rows.unionByName(cents_rows)


@query(
    "snk_redis_uniq",
    oracle="""
    SELECT DISTINCT
      'SADD' AS cmd,
      'uniq:' || event_type || ':'
      || COALESCE(strftime(ts, '%Y:%m:%d'), '-') AS key,
      COALESCE(CAST(user_id AS VARCHAR), '-') AS member
    FROM events
    """,
)
def snk_redis_uniq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SADD command stream for per-(type, day) unique visitors."""
    return unique_commands(table(spark, sf_dir, "events"))


@query(
    "stream_redis_counters",
    oracle="""
    WITH agg AS (
      SELECT
        'stats:' || event_type || ':'
          || COALESCE(strftime(ts, '%Y:%m:%d:%H'), '-') AS key,
        CAST(count(*) AS BIGINT) AS n,
        CAST(COALESCE(sum(CAST(round(value * 100) AS BIGINT)), 0) AS BIGINT)
          AS cents
      FROM events
      GROUP BY 1
    )
    SELECT key, 'n' AS field, n AS val FROM agg
    UNION ALL
    SELECT key, 'cents' AS field, cents AS val FROM agg
    """,
)
def stream_redis_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END reference pipeline: event stream -> foreachBatch Redis
    sink -> final counter state (SURVEY.md §3.2 EP3, the production shape).

    The final HINCRBY-accumulated hash state must equal the batch group-by
    — regardless of how the stream was micro-batched, because the per-batch
    deltas are additive. Runs against FakeRedis here; the writer class is
    the same one a real deployment points at a redis cluster.
    """
    ev = stream_table(spark, sf_dir, "events")
    fake = FakeRedis()
    sink = RedisCounterSink(lambda: fake)
    run_foreach_batch(ev, sink, mode="append")
    rows = [
        (key, field, int(val))
        for key, h in fake.hashes.items()
        for field, val in h.items()
    ]
    return spark.createDataFrame(rows, "key string, field string, val long")


@query(
    "snk_redis_resp",
    oracle="""
    WITH agg AS (
      SELECT
        'stats:' || event_type || ':'
          || COALESCE(strftime(ts, '%Y:%m:%d:%H'), '-') AS key,
        CAST(count(*) AS BIGINT) AS n,
        CAST(COALESCE(sum(CAST(round(value * 100) AS BIGINT)), 0) AS BIGINT)
          AS cents
      FROM events
      GROUP BY 1
    )
    SELECT key, 'n' AS field, n AS val FROM agg
    UNION ALL
    SELECT key, 'cents' AS field, cents AS val FROM agg
    """,
)
def snk_redis_resp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION Redis sink path over a REAL TCP socket (r6, closing
    VERDICT r5 item 3): event stream -> foreachBatch RedisCounterSink with
    ``distributed=True`` — every partition pipelines its staged HSETs over
    its OWN socket connection — then the MULTI/EXEC commit, against an
    in-process RESP server (sinks/resp.py; the socket_source.py pattern
    applied to the sink side). The final server-side counter hashes are
    read back over the same protocol and must equal the batch group-by —
    proving the wire encoding, the per-partition pipelining, the staged
    two-phase commit, and the bytes-reply normalization end-to-end. A
    deployment swaps the URL for a real Redis cluster; nothing else
    changes.
    """
    from .resp import MiniRedisServer, RespClient

    ev = stream_table(spark, sf_dir, "events")
    srv = MiniRedisServer()
    try:
        url = srv.url
        sink = RedisCounterSink(
            lambda u=url: RespClient.from_url(u), distributed=True
        )
        run_foreach_batch(ev, sink, mode="append")
        reader = RespClient.from_url(url)
        rows = []
        with srv.lock:
            counter_keys = [
                k for k in srv.hashes if k.startswith("stats:")
            ]
        for key in counter_keys:
            for field, val in reader.hgetall(key).items():
                rows.append((key, field.decode(), int(val)))
        reader.close()
    finally:
        srv.close()
    return spark.createDataFrame(rows, "key string, field string, val long")


@query(
    "snk_parquet",
    oracle="""
    SELECT
      event_type,
      CAST(count(*) AS BIGINT) AS n_events,
      CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users
    FROM events
    GROUP BY event_type
    """,
)
def snk_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink round-trip: aggregate -> write -> re-scan.

    What comes back off disk must equal the in-flight result (schema and
    values) — the batch materialization path used between pipeline stages.
    """
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("uniq_users"),
    )
    out_dir = f"{tempfile.gettempdir()}/bootic_snk_{uuid.uuid4().hex[:8]}"
    agg.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)


@query(
    "snk_stream_parquet",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def snk_stream_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING file sink with exactly-once file commits: events stream ->
    append-mode parquet sink -> re-scan must equal the batch truth.

    The parquet streaming sink commits files through the _spark_metadata
    transaction log, so a re-read sees exactly the committed set even if a
    micro-batch died mid-write — the file-system counterpart of the Redis
    sink's marker transaction, and the standard inter-stage handoff of a
    100 TB pipeline (stream in, parquet out, next stage scans).
    """
    ev = stream_table(spark, sf_dir, "events").select("event_id", "event_type")
    out = tempfile.mkdtemp(prefix="bootic_stream_pq_")
    q = (
        ev.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bootic_pq_ckpt_"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):  # pragma: no cover - hang guard
        q.stop()
        raise TimeoutError("streaming parquet sink exceeded 300s")
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )


COMPACT_TARGET_FILES = 4


@query(
    "snk_compact",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY event_type
    """,
)
def snk_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the hygiene pass every long-running 100 TB
    pipeline needs: a streaming sink leaves thousands of per-batch files;
    compaction rewrites a partition's worth into TARGET-sized files so the
    next stage's scan isn't file-open-bound. Here: fragment events into
    many small files, compact with repartition(N), verify the data survived
    byte-exactly (oracle) and the file count hit the target
    (tests/test_properties.py).
    """
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    frag = f"{tempfile.gettempdir()}/bootic_frag_{uuid.uuid4().hex[:8]}"
    ev.repartition(64).write.mode("overwrite").parquet(frag)  # the mess
    compacted = f"{tempfile.gettempdir()}/bootic_compact_{uuid.uuid4().hex[:8]}"
    (
        spark.read.parquet(frag)
        .repartition(COMPACT_TARGET_FILES)
        .write.mode("overwrite")
        .parquet(compacted)
    )
    back = spark.read.parquet(compacted)
    out = back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    # stash the dirs on the function for the file-count property test
    snk_compact.last_dirs = (frag, compacted)  # type: ignore[attr-defined]
    return out


@query(
    "snk_partition_overwrite",
    oracle="""
    -- replay of the dynamic partition overwrite: the earliest day's
    -- partition is rewritten to purchases-only; every other day untouched.
    -- NULL event_date rows land in (and survive as) Spark's
    -- __HIVE_DEFAULT_PARTITION__ — an untouched partition like any other —
    -- so the IS NULL branch keeps them (hostile sweep r7).
    WITH ev AS (
      SELECT *, CAST(date_trunc('day', ts) AS DATE) AS event_date FROM events
    ),
    final AS (
      -- `ts IS NULL`, not `event_date IS NULL`: DuckDB v1.0.0's optimizer
      -- wrongly folds `CAST(date_trunc('day', ts) AS DATE) IS NULL` to
      -- false (statistics propagation marks the cast non-NULL; measured
      -- on the hostile fixture, r7). ts IS NULL is the same predicate.
      SELECT * FROM ev WHERE ts IS NULL
        OR event_date <> (SELECT min(event_date) FROM ev)
      UNION ALL
      SELECT * FROM ev
      WHERE event_date = (SELECT min(event_date) FROM ev)
        AND event_type = 'purchase'
    )
    SELECT
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(count(DISTINCT event_date) AS BIGINT) AS n_days,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM final
    """,
)
def snk_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition overwrite — the idempotent-backfill sink: rewrite
    exactly the partitions present in the incoming frame, leave every other
    partition byte-untouched. This is how a 100 TB pipeline reprocesses one
    bad day without static-overwrite's truncate-the-table hazard and
    without read-modify-write of the whole dataset.

    Here: events land partitioned by day, then the earliest day is
    re-backfilled as purchases-only via
    ``partitionOverwriteMode=dynamic``; the read-back aggregate proves the
    other days survived and the target day was replaced. The replacement
    day is selected with a broadcast min-join — no driver collect in the
    dataflow.
    """
    ev = table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = f"{tempfile.gettempdir()}/bootic_dynpart_{uuid.uuid4().hex[:8]}"
    ev.write.partitionBy("event_date").mode("overwrite").parquet(path)
    first_day = ev.agg(F.min("event_date").alias("event_date"))
    replacement = ev.join(first_day, "event_date").filter(
        F.col("event_type") == "purchase"
    )
    (
        replacement.select(ev.columns)  # same column order as first write
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    out = back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("event_date").cast("long").alias("n_days"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    snk_partition_overwrite.last_dir = path  # type: ignore[attr-defined]
    return out


@query(
    "snk_observe_audit",
    oracle="""
    -- write-path audit metrics: the counters a pipeline records WHILE
    -- writing (no second scan), replayed as plain aggregates
    SELECT
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(min(event_id) AS BIGINT) AS min_id,
      CAST(max(event_id) AS BIGINT) AS max_id,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
      CAST(count(*) FILTER (WHERE value > 300) AS BIGINT) AS n_big
    FROM events
    """,
)
def snk_observe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-path audit metrics via ``DataFrame.observe`` — the lineage
    counters every production sink records (rows written, distinct keys,
    money total, anomaly count) WITHOUT a second scan: ``observe`` attaches
    accumulator-style aggregates to the plan, the parquet write action
    drives them, and the metrics surface after the single pass. At 100 TB
    a re-scan for auditing doubles the I/O bill; this is the Spark-native
    way to not pay it. The returned one-row frame is the audit record the
    oracle replays with plain SQL. (DISTINCT aggregates are rejected in
    observed metrics — Spark enforces mergeable-only — so the uniques
    audit would use approx_count_distinct; kept exact-only here.)
    """
    from pyspark.sql import Observation

    ev = table(spark, sf_dir, "events")
    obs = Observation("audit")
    out = f"{tempfile.gettempdir()}/bootic_audit_{uuid.uuid4().hex[:8]}"
    (
        ev.observe(
            obs,
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("event_id").cast("long").alias("min_id"),
            F.max("event_id").cast("long").alias("max_id"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
            F.count_if(F.col("value") > 300).cast("long").alias("n_big"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["min_id"], m["max_id"], m["cents"], m["n_big"])],
        "n_rows long, min_id long, max_id long, cents long, n_big long",
    )


@query(
    "snk_jsonl_export",
    oracle="""
    -- JSONL export shards, read back: per-language doc counts and char
    -- totals must survive the write -> re-read round trip byte-exactly
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(CAST(doc_id % 1000 AS BIGINT)) AS BIGINT) AS id_check
    FROM documents
    WHERE n_chars > 100
    GROUP BY lang
    """,
)
def snk_jsonl_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus export — the handoff format every LLM trainer ingests:
    curated docs written as newline-delimited JSON, sharded by language
    (``partitionBy('lang')`` → one directory per lang, parallel shard
    files inside). The round trip is the test: re-read the shards WITH an
    explicit schema (no inference scan) and re-aggregate; counts, char
    totals, and an id checksum must equal the pre-export truth, proving
    no row, field, or encoding was lost in serialization. At 100 TB the
    export is a map-only write sharded by the partition column; readers
    get per-lang directory pruning for free.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 100)
    out = f"{tempfile.gettempdir()}/bootic_jsonl_{uuid.uuid4().hex[:8]}"
    (
        d.select("doc_id", "lang", "text", "n_chars")
        .write.mode("overwrite")
        .partitionBy("lang")
        .json(out)
    )
    back = spark.read.schema(
        "doc_id long, text string, n_chars long, lang string"
    ).json(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(F.col("doc_id") % 1000).cast("long").alias("id_check"),
    )


@query(
    "snk_merge_upsert",
    oracle="""
    -- MERGE-style upsert without a table format: base counters + an
    -- update batch -> last-writer-wins rewrite; matched keys take the
    -- update, unmatched keep base, brand-new keys insert
    WITH base AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE date_part('day', ts) <= 25 GROUP BY 1, 2
    ),
    updates AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE date_part('day', ts) >= 20 GROUP BY 1, 2
    )
    SELECT
      coalesce(u.event_type, b.event_type) AS event_type,
      coalesce(u.day, b.day) AS day,
      coalesce(u.n, b.n) AS n,
      u.n IS NOT NULL AS from_update
    FROM base b FULL OUTER JOIN updates u
      ON b.event_type = u.event_type AND b.day = u.day
    """,
)
def snk_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a lakehouse table format: the
    partition-rewrite upsert every parquet-only pipeline runs — matched
    keys take the update row (last writer wins), unmatched base rows
    survive, new keys insert. Expressed as one FULL OUTER equi-join +
    coalesce projection, which is exactly what Delta/Iceberg MERGE plans
    under the hood; here the rewrite target is plain parquet, written and
    re-read so the materialized state is what gets checked. At 100 TB the
    join shuffles only the two counter tables (small) — the raw events
    never re-scan — and pairing with dynamic partition overwrite
    (snk_partition_overwrite) bounds the rewrite to touched partitions.
    """
    ev = table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    base = (
        ev.filter(F.dayofmonth("ts") <= 25)
        .groupBy("event_type", day)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    updates = (
        ev.filter(F.dayofmonth("ts") >= 20)
        .groupBy("event_type", day)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    b, u = base.alias("b"), updates.alias("u")
    merged = (
        b.join(
            u,
            (F.col("b.event_type") == F.col("u.event_type"))
            & (F.col("b.day") == F.col("u.day")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("u.event_type"), F.col("b.event_type")).alias(
                "event_type"
            ),
            F.coalesce(F.col("u.day"), F.col("b.day")).alias("day"),
            F.coalesce(F.col("u.n"), F.col("b.n")).alias("n"),
            F.col("u.n").isNotNull().alias("from_update"),
        )
    )
    out = f"{tempfile.gettempdir()}/bootic_merge_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@query(
    "snk_multi_fanout",
    oracle="""
    -- both fan-out sinks must independently reconstruct the batch truth
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(count(*) AS BIGINT) AS n_rollup,
           true AS consistent
    FROM events
    GROUP BY event_type
    """,
)
def snk_multi_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MULTI-SINK fan-out: one micro-batch lands in TWO sinks
    (raw archive + per-batch rollup) inside a single foreachBatch call —
    the standard shape when a stream must feed both the lake and a serving
    store. Idempotence across micro-batch REPLAYS comes from writing each
    sink under ``b=<batch_id>`` with overwrite: a recovered batch
    re-overwrites its own directory instead of double-appending (the
    file-system analog of the Redis sink's marker transaction). The batch
    DataFrame is persisted for the duration of the call so the two sinks
    share one upstream computation instead of re-reading the source.
    Verification: the raw archive and the summed per-batch rollups must
    independently reconstruct the same per-type counts — and must equal
    the DuckDB batch truth.
    """
    ev = stream_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    root = tempfile.mkdtemp(prefix="bootic_fanout_")

    def fan_out(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode("overwrite").parquet(f"{root}/raw/b={batch_id}")
            (
                batch_df.groupBy("event_type")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .write.mode("overwrite")
                .parquet(f"{root}/rollup/b={batch_id}")
            )
        finally:
            batch_df.unpersist()

    run_foreach_batch(ev, fan_out, mode="append")
    raw = (
        spark.read.option("basePath", f"{root}/raw")
        .parquet(f"{root}/raw/b=*")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    )
    rolled = (
        spark.read.option("basePath", f"{root}/rollup")
        .parquet(f"{root}/rollup/b=*")
        .groupBy("event_type")
        .agg(F.sum("n").cast("long").alias("n_rollup"))
    )
    return raw.join(rolled, "event_type", "full").select(
        "event_type",
        "n_raw",
        "n_rollup",
        (
            F.col("n_raw").eqNullSafe(F.col("n_rollup"))
        ).alias("consistent"),
    )


@query(
    "snk_csv_export",
    oracle="""
    -- the CSV hop must be lossless: quoted delimiters, negative cents,
    -- and the rollup values all survive write -> schema'd re-read
    SELECT event_type || ',' || 'export' AS label,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) - 50000 AS BIGINT)
             AS cents_adj
    FROM events
    GROUP BY event_type
    """,
)
def snk_csv_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV EXPORT sink (the interchange format downstream spreadsheets and
    legacy loaders still demand): rollup -> header'd CSV -> re-read with
    a DECLARED schema must round-trip value-identically. The label column
    embeds the delimiter itself so the writer's quoting and the reader's
    unquoting are both on trial, and the cents column is shifted negative
    to cover sign round-trips. Money travels as integer cents — exporting
    floats to text and re-parsing them is the classic CSV corruption. The
    export is a plain partitioned write (one file per partition, no
    coordination) at any scale.
    """
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.sum(cents("value")) - 50000).cast("long").alias("cents_adj"),
    ).select(
        F.concat(F.col("event_type"), F.lit(",export")).alias("label"),
        "n_events",
        "cents_adj",
    )
    out = f"{tempfile.gettempdir()}/bootic_csvexp_{uuid.uuid4().hex[:8]}"
    agg.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(
        "label STRING, n_events LONG, cents_adj LONG"
    ).option("header", True).csv(out)
