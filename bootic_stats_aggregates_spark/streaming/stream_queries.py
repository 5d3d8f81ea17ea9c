"""Streaming operators (SURVEY.md §2.8) — the reference's core execution
model, upgraded from processing-time Redis counters to event-time
Structured Streaming.

Every query here runs a REAL streaming job (file source ->
incremental stateful plan -> memory sink, Trigger.AvailableNow) and returns
the sink contents, so the driver can compare streaming results against
batch DuckDB oracles — the streaming==batch equivalence contract
(SURVEY.md §5.2 item 3).

Reference mapping (reconstructed, /root/reference empty — SURVEY.md §0):
hour-bucket HINCRBY loop -> tumbling window counts; implicit visit tracking
-> session windows; ZMQ redelivery tolerance -> dropDuplicatesWithinWatermark;
no late-data concept in the reference -> watermarks are a strict upgrade.

Scale: all aggregates are mergeable; state is bounded by watermarks; the
RocksDB state-store provider would back these on a cluster.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..helpers import cents
from ..io import table
from ..llm.text import quality_keep_sql
from ..registry import query
from .runner import run_to_memory, stream_table


@query(
    "src_event_stream",
    oracle="""
    SELECT event_id, event_type, user_id FROM events
    """,
)
def src_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbounded event source itself (ZMQ SUB/PULL socket analog,
    SURVEY.md §2.1): ingest the stream, emit every row — proves the source
    delivers exactly the fixture rows, no more, no less."""
    ev = stream_table(spark, sf_dir, "events")
    out = run_to_memory(
        ev.select("event_id", "event_type", "user_id"), mode="append"
    )
    return out


@query(
    "stream_output_modes",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def stream_output_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update-mode semantics — the HINCRBY-shaped output contract
    (SURVEY.md §2.8 stream_output_modes): each micro-batch emits only the
    groups whose counters changed. Counters only grow, so max-per-key over
    the update stream equals the final batch truth under ANY micro-batch
    split."""
    ev = stream_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    updates = run_to_memory(agg, mode="update")
    return updates.groupBy("event_type").agg(
        F.max("n_events").cast("long").alias("n_events")
    )


@query(
    "stream_tumbling",
    oracle="""
    SELECT
      date_trunc('hour', ts) AS bucket_hour,
      event_type,
      CAST(count(*) AS BIGINT) AS n_events,
      round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)
        AS total_value
    FROM events
    WHERE ts IS NOT NULL  -- event-time windows REQUIRE an event time
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counters per event type — the reference's hot path
    as a streaming stateful aggregation (complete output to make the full
    materialized state comparable).

    NULL-ts contract (hostile fixture r7): ``window()`` cannot assign a
    clock-less row to any window — Spark's event-time operators drop it —
    so the oracle models the same contract with ``ts IS NOT NULL``;
    surfacing/landing those rows is ``stream_late_deadletter``'s job."""
    ev = stream_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum(cents("value")).cast("double") / 100.0, 2).alias(
            "total_value"
        ),
    )
    out = run_to_memory(agg, mode="complete")
    return out.select(
        F.col("window.start").alias("bucket_hour"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "stream_sliding",
    oracle="""
    SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM (
      SELECT
        unnest(generate_series(
          date_trunc('minute', ts)
            - INTERVAL (EXTRACT(minute FROM ts)::INT % 15) MINUTE
            - INTERVAL 45 MINUTE,
          date_trunc('minute', ts)
            - INTERVAL (EXTRACT(minute FROM ts)::INT % 15) MINUTE,
          INTERVAL 15 MINUTE
        )) AS w_start,
        event_type
      FROM events
    )
    GROUP BY w_start, event_type
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour window, 15 min slide): each event lands in 4
    overlapping windows. The oracle expands the same 4 starts per event."""
    ev = stream_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.window("ts", "1 hour", "15 minutes"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    out = run_to_memory(agg, mode="complete")
    return out.select(
        F.col("window.start").alias("w_start"), "event_type", "n_events"
    )


@query(
    "stream_session",
    oracle="""
    WITH flagged AS (
      SELECT
        user_id, ts,
        CASE
          WHEN lag(ts) OVER w IS NULL
            OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
          THEN 1 ELSE 0
        END AS new_session
      FROM events
      WHERE ts IS NOT NULL  -- session windows REQUIRE an event time
      WINDOW w AS (PARTITION BY COALESCE(user_id, -1) ORDER BY ts)
    ),
    sessions AS (
      SELECT
        user_id, ts,
        sum(new_session) OVER (
          -- COALESCE sentinel: DuckDB v1.0.0's windowed PARTITION BY
          -- nondeterministically merges a NULL-key partition into a
          -- neighbor (measured 20/30 runs on the hostile fixture, r7);
          -- a non-NULL sentinel keys the same partition stably. GROUP BY
          -- below is unaffected (hash-agg NULL grouping is sound).
          PARTITION BY COALESCE(user_id, -1) ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
      FROM flagged
    )
    SELECT
      user_id,
      min(ts) AS session_start,
      max(ts) + INTERVAL 30 MINUTE AS session_end,
      CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a visit).

    ``session_window`` merges events into [first_ts, last_ts + gap) per
    user in streaming state; the oracle is the classic gaps-and-islands
    construction over the same rows, filtered to ``ts IS NOT NULL``
    because a clock-less row cannot join any session window (Spark's
    event-time operators drop it; ``stream_late_deadletter`` accounts
    for such rows). Session starts when gap >= 30min —
    session windows are half-open intervals).
    """
    ev = stream_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.session_window("ts", "30 minutes"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    out = run_to_memory(agg, mode="complete")
    return out.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once per event id under redelivery.

    The ZMQ funnel can redeliver; the reference would double-count. Here the
    stream is unioned with itself (every event delivered twice) and
    ``dropDuplicatesWithinWatermark`` restores exactly-once before the
    counters — so the result equals plain single-delivery counts.
    """
    a = stream_table(spark, sf_dir, "events")
    b = stream_table(spark, sf_dir, "events")
    doubled = a.unionByName(b)
    deduped = (
        doubled.withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    out = run_to_memory(agg, mode="complete")
    return out.select("event_type", "n_events")


_STATE_SCHEMA = "n_events long, cents long, emit_seq long"
_STATEFUL_OUT = "user_id long, n_events long, total_value double, emit_seq long"


def _funnel_update(key, pdfs, state):
    """Per-user running counters in explicit state (GroupState).

    Money is accumulated as integer cents so the Python-side running state
    is exact and matches the decimal-sum oracle. ``emit_seq`` is a per-key
    emission ordinal carried IN the state: the final-state reduction keys on
    it explicitly instead of assuming the counters are monotonic (ADVICE r1
    nit — ordering by n_events happened to work only because counts never
    decrease).
    """
    n, cents, seq = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(round(pdf["value"].sum() * 100))
    seq += 1
    state.update((n, cents, seq))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "emit_seq": [seq],
        }
    )


@query(
    "stream_stateful",
    oracle="""
    SELECT
      user_id,
      CAST(count(*) AS BIGINT) AS n_events,
      CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary per-user state via applyInPandasWithState (Arrow-batched).

    The custom-operator escape hatch (SURVEY.md §2.8 stream_stateful): state
    the built-in aggregates can't express lives in an explicit GroupState.
    Here the state is (count, cents) per user — deliberately simple so the
    DuckDB oracle can verify the machinery end-to-end.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = stream_table(spark, sf_dir, "events").select("user_id", "value")
    result = ev.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=_STATEFUL_OUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_memory(result, mode="update")
    # One emitted row per (user, batch); the row with the highest emission
    # ordinal is the final state under ANY micro-batching — an explicit
    # tie-break, not a monotonic-counter assumption.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("emit_seq"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# stream_stateful_v2: Spark 4's transformWithStateInPandas (VERDICT r8
# task 5). The successor stateful API: a StatefulProcessor class with
# TYPED state variables (value state for counters, list state for the
# seen-event-type set) instead of one opaque GroupState tuple. Its
# Python worker speaks a protobuf-framed state-server protocol, so the
# API needs a working google.protobuf — probed at RUNTIME; where the
# dependency is broken (this container ships a stub without
# `descriptor`), the op computes the identical funnel-stage result via
# applyInPandasWithState with bitmask state (the fully-supported v1
# API), so the registered query is green in either environment and
# flips to the new API the day the dependency works (the
# test_transform_with_state_probe gate documents this).

#: funnel stages, order-free SET semantics so the result is exact under
#: ANY micro-batching / any within-batch row order
_V2_OUT = "user_id long, stage long, n_events long, emit_seq long"
_V2_STATE = "n long, seq long, mask long"
_V2_STAGES = ("view", "click", "purchase")


def _stage_of(mask: int) -> int:
    stage = 0
    for i in range(len(_V2_STAGES)):
        if mask & (1 << i):
            stage = i + 1
        else:
            break
    return stage


def _funnel_stage_v1(key, pdfs, state):
    """applyInPandasWithState twin of :class:`_FunnelStageProcessor`:
    same (count, seen-set) semantics packed into a bitmask long."""
    n, seq, mask = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        for i, et in enumerate(_V2_STAGES):
            if (pdf["event_type"] == et).any():
                mask |= 1 << i
    seq += 1
    state.update((n, seq, mask))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "stage": [_stage_of(mask)],
            "n_events": [n],
            "emit_seq": [seq],
        }
    )


def twsip_available() -> bool:
    """Is transformWithStateInPandas usable here? Its state-server
    protocol needs a REAL google.protobuf in the Python worker."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except Exception:  # pragma: no cover - env-dependent
        return False


def _make_funnel_processor():
    """Build the StatefulProcessor subclass lazily (import-safe on
    builds without the stateful_processor module)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _FunnelStageProcessor(StatefulProcessor):
        """Per-user funnel stage with TYPED state variables:
        - value state (n, seq): event count + emission ordinal
        - list state seen(et): the distinct event types observed —
          the set-shaped state the v1 API would force into a bitmask
        Stage = longest prefix of view -> click -> purchase present in
        the seen SET (order-free, so exact under any batching)."""

        def init(self, handle) -> None:
            self.counts = handle.getValueState("counts", "n long, seq long")
            self.seen = handle.getListState("seen", "et string")

        def handleInputRows(self, key, rows, timerValues):
            v = self.counts.get()
            n, seq = v if v else (0, 0)
            seen = {t[0] for t in self.seen.get()}
            fresh: set = set()
            for pdf in rows:
                n += len(pdf)
                fresh |= set(pdf["event_type"].dropna().unique()) - seen
            if fresh:
                self.seen.appendList([(t,) for t in sorted(fresh)])
                seen |= fresh
            seq += 1
            self.counts.update((n, seq))
            mask = sum(
                1 << i for i, et in enumerate(_V2_STAGES) if et in seen
            )
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "stage": [_stage_of(mask)],
                    "n_events": [n],
                    "emit_seq": [seq],
                }
            )

        def close(self) -> None:
            pass

    return _FunnelStageProcessor()


def _funnel_stage_result(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Run the funnel-stage stateful computation over ``ev`` on the best
    available API and reduce update-mode emissions to final state."""
    if twsip_available():
        # transformWithState requires the RocksDB state store; scope the
        # provider to this query's run and restore the session default
        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
        try:
            result = ev.groupBy("user_id").transformWithStateInPandas(
                statefulProcessor=_make_funnel_processor(),
                outputStructType=_V2_OUT,
                outputMode="Update",
                timeMode="None",
            )
            out = run_to_memory(result, mode="update")
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    else:
        from pyspark.sql.streaming.state import GroupStateTimeout

        result = ev.groupBy("user_id").applyInPandasWithState(
            _funnel_stage_v1,
            outputStructType=_V2_OUT,
            stateStructType=_V2_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        out = run_to_memory(result, mode="update")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("emit_seq"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "stage", "n_events")
    )


@query(
    "stream_stateful_v2",
    oracle="""
    SELECT
      user_id,
      CAST(CASE WHEN bool_or(event_type = 'view') THEN
             CASE WHEN bool_or(event_type = 'click') THEN
               CASE WHEN bool_or(event_type = 'purchase')
                    THEN 3 ELSE 2 END
             ELSE 1 END
           ELSE 0 END AS BIGINT) AS stage,
      CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel stage via Spark 4's transformWithStateInPandas
    (typed value + list state), with a semantics-identical
    applyInPandasWithState fallback where the API's protobuf dependency
    is broken (probed at runtime — see the module comment above).

    Stage semantics are a SET prefix (view -> click -> purchase seen,
    any order), so the result is exact under any micro-batching and the
    DuckDB oracle replays it with three bool_or aggregates.

    100 TB story: state is O(users) across the cluster's state store
    (RocksDB under the v2 API), each trigger touches O(batch) rows, and
    the list state holds at most len(_V2_STAGES)+ distinct event types
    per user — bounded by the domain, not the stream."""
    ev = stream_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    )
    return _funnel_stage_result(spark, ev)


@query(
    "join_stream_static",
    oracle="""
    SELECT
      c_mktsegment,
      event_type,
      CAST(count(*) AS BIGINT) AS n_events
    FROM events
    JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def join_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich the event stream with a static dimension (stream ⋈ broadcast
    static — no streaming state needed for the join itself)."""
    ev = stream_table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer")
    joined = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey
    )
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    out = run_to_memory(agg, mode="complete")
    return out.select("c_mktsegment", "event_type", "n_events")


@query(
    "join_stream_stream",
    oracle="""
    SELECT
      v.event_id AS view_id,
      p.event_id AS purchase_id,
      v.user_id
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def join_stream_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases within 1h of a view by the
    same user. Watermarks on both sides bound the join state."""
    views = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts"
            " AND p_ts <= v_ts + interval 1 hour"
        ),
    )
    out = run_to_memory(joined, mode="append")
    return out.select(
        "view_id", "purchase_id", F.col("v_user").alias("user_id")
    )


#: Fixture event-time range ends 2024-01-30 23:57; with a 1-hour watermark
#: the final watermark lands inside Jan 30, so the Jan-30 day window is the
#: only unfinalized one.
FINAL_OPEN_DAY = "2024-01-30 00:00:00"


@query(
    "stream_watermark",
    oracle=f"""
    SELECT
      date_trunc('day', ts) AS day,
      event_type,
      CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE date_trunc('day', ts) < TIMESTAMP '{FINAL_OPEN_DAY}'
    GROUP BY 1, 2
    """,
)
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-driven window finalization (append mode's hard guarantee).

    Append mode emits a window only once the watermark (max event time −
    1 hour) passes its end: every completed day is emitted exactly once and
    is final; the still-open last day is withheld. The oracle is exactly
    the finalized subset. (Note: *input*-side late-row dropping is
    best-effort in Spark — observed on 4.1.2 that late rows for fresh
    windows are still aggregated — so this operator demonstrates the
    guaranteed half of watermark semantics; the reference daemon has no
    event-time notion at all.)
    """
    ev = stream_table(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    out = run_to_memory(agg, mode="append")
    return out.select(
        F.col("window.start").alias("day"), "event_type", "n_events"
    )


@query(
    "stream_quality_gate",
    oracle=f"""
    -- batch truth of the streamed curation gate: keep/drop tallies per lang
    SELECT
      lang,
      {quality_keep_sql()} AS keep,
      CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
)
def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline as a STREAM — documents flow through the
    Gopher-style hard gate incrementally and the keep/drop tallies per lang
    must equal the batch truth (streaming==batch equivalence for the LLM
    path, not just the counter path). This is the 100 TB ingest shape: the
    gate is stateless per row, so the only streaming state is the final
    counter aggregate.
    """
    from ..llm.text import quality_gate_cols

    docs = stream_table(spark, sf_dir, "documents")
    # identical gate expressions as the batch op — one definition
    _n_tok, _mean_wl, _n_stop, keep = quality_gate_cols()
    agg = docs.groupBy("lang", keep.alias("keep")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    out = run_to_memory(agg, mode="complete")
    return out.select("lang", "keep", "n_docs")


@query(
    "stream_incr_dedup",
    oracle="""
    -- incremental corpus dedup: arriving docs are deduped within the
    -- stream AND against the already-ingested corpus; per-lang counts of
    -- genuinely-new texts are deterministic regardless of arrival order
    WITH corpus AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 4 = 0
    ),
    arriving AS (
      SELECT DISTINCT lang, md5(text) AS h
      FROM documents WHERE doc_id % 4 <> 0
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_new
    FROM arriving a
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = a.h)
    GROUP BY lang
    """,
)
def stream_incr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus deduplication — the STREAMING shape of
    ``llm_exact_dedup``: documents arrive continuously and must be dropped
    if (a) an identical text already landed earlier in the stream
    (``dropDuplicates`` keyed on the content hash — state-store backed) or
    (b) it already exists in the ingested corpus (stream-static LEFT ANTI
    join against the corpus hash set — re-planned per micro-batch, so
    corpus growth between batches is picked up). This is how a pipeline
    keeps a 100 TB corpus duplicate-free without re-running batch dedup:
    per-batch state lookups + an anti join, never a full rescan. Corpus =
    ``doc_id % 4 == 0`` docs (deterministic); output counts only distinct
    (lang, hash) pairs so arrival order cannot change the answer.
    """
    corpus = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 0)
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    arriving = (
        stream_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 != 0)
        .select("lang", F.md5("text").alias("h"))
        .dropDuplicates(["lang", "h"])
    )
    new = arriving.join(corpus, "h", "left_anti")
    agg = new.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    out = run_to_memory(agg, mode="complete")
    return out.select("lang", "n_new")


@query(
    "stream_chained_stateful",
    oracle="""
    -- two stateful operators CHAINED in one streaming query: dedup state
    -- feeding windowed-aggregation state; final counts equal the batch
    -- truth over single-delivery events
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE ts IS NOT NULL  -- event-time windows REQUIRE an event time
    GROUP BY 1, 2
    """,
)
def stream_chained_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in a single streaming query (Spark
    3.4+): redelivery dedup (state keyed on event_id within the
    watermark) flows DIRECTLY into an event-time tumbling aggregation
    (window state) — one query, two state stores, no intermediate sink.
    Before operator chaining landed, pipelines materialized between
    stateful steps (extra storage + latency); this is the fused shape a
    production ingest runs. The input is the stream unioned with itself
    (every event delivered twice), so the dedup stage is provably doing
    work: final window counts equal the single-delivery batch truth.
    Complete output mode surfaces the whole materialized window state
    (append would emit only watermark-expired windows, and AvailableNow
    terminates before the fixture's watermark expires anything).
    """
    a = stream_table(spark, sf_dir, "events")
    b = stream_table(spark, sf_dir, "events")
    doubled = a.unionByName(b).withWatermark("ts", "30 days")
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])
    agg = deduped.groupBy(
        F.window("ts", "1 hour"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    out = run_to_memory(agg, mode="complete")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n_events"
    )


N_BACKPRESSURE_SHARDS = 4  # staged source files; one micro-batch each


@query(
    "stream_backpressure",
    oracle="""
    -- bounded micro-batch intake: the final counters must equal the
    -- batch truth NO MATTER how the backlog was split into batches
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users
    FROM events
    GROUP BY event_type
    """,
)
def stream_backpressure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded micro-batch intake (``maxFilesPerTrigger``) — backlog
    replay without state-store blowup: when a stream restarts against
    hours of accumulated input, unbounded intake loads the whole backlog
    into one giant micro-batch (peak state memory, checkpoint stall);
    capping files-per-trigger drains it in bounded slices. The events
    fixture is staged into N_BACKPRESSURE_SHARDS files and ingested one
    file per trigger — so this AvailableNow run provably executes
    multiple micro-batches — and the final counters equal the batch
    truth, which is exactly the mergeable-aggregate guarantee the
    engine's counters rely on (batch-split independence). The Kafka
    transport's maxOffsetsPerTrigger knob (runner.py) is the same
    control on the bus.
    """
    import os
    import shutil

    from .runner import _STAGE_ROOT

    key = f"{sf_dir.strip('/').replace('/', '_')}__events_sharded"
    d = os.path.join(_STAGE_ROOT, key)
    marker = os.path.join(d, "_STAGED")
    # The marker records a (size, mtime_ns) fingerprint of the source
    # parquet: a regenerated fixture invalidates the staged shards instead
    # of silently replaying stale rows (hostile sweep r7 found exactly
    # that — shards staged before the fixture gained its NULL-ts rows).
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fingerprint = f"{st.st_size}:{st.st_mtime_ns}"
    stale = True
    if os.path.exists(marker):
        with open(marker) as fh:
            stale = fh.read().strip() != fingerprint
    if stale:
        shutil.rmtree(d, ignore_errors=True)
        (
            table(spark, sf_dir, "events")
            .repartition(N_BACKPRESSURE_SHARDS)
            .write.mode("overwrite")
            .parquet(d)
        )
        with open(marker, "w") as fh:
            fh.write(fingerprint)
    ev = (
        spark.readStream.schema(table(spark, sf_dir, "events").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    # exact distinct is not streaming-mergeable across micro-batches;
    # count it from the deduped (type, user) pairs instead. NULL users are
    # dropped first: dropDuplicates keeps NULL as its own key, while SQL
    # count(DISTINCT user_id) ignores NULL (hostile-fixture sweep, r5).
    pairs = (
        ev.select("event_type", "user_id")
        .filter(F.col("user_id").isNotNull())
        .dropDuplicates(["event_type", "user_id"])
    )
    uniq = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("uniq_users")
    )
    n = run_to_memory(agg, mode="complete").select("event_type", "n_events")
    u = run_to_memory(uniq, mode="complete")
    # LEFT join, null-safe on the key: a group whose users are ALL NULL has
    # no row in `uniq` (the isNotNull filter above removed every pair), and
    # an inner join would silently drop the whole group where the oracle's
    # count(DISTINCT user_id) emits it with 0; a NULL event_type group must
    # also survive the join (ADVICE r5).
    return n.join(
        u, n["event_type"].eqNullSafe(u["event_type"]), "left"
    ).select(
        n["event_type"],
        "n_events",
        F.coalesce(u["uniq_users"], F.lit(0)).cast("long").alias("uniq_users"),
    )


@query(
    "stream_topk_rank",
    oracle="""
    -- the streaming ranking must converge to the batch truth: top-3
    -- users per event type by count, rank tie-broken by user_id
    SELECT event_type, user_id, n, rk FROM (
      SELECT event_type, user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(row_number() OVER (
               PARTITION BY event_type ORDER BY count(*) DESC, user_id
             ) AS BIGINT) AS rk
      FROM events
      GROUP BY event_type, user_id
    ) WHERE rk <= 3
    """,
)
def stream_topk_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING top-k rankings — the reference's actual dashboard
    product (`ZINCRBY top_users:<type>` + `ZREVRANGE`, SURVEY.md §2.5):
    per-key counters accumulate incrementally in the stream; the k-best
    cut is computed ON THE SINK, not in the stream. That split is the
    scale design, not a workaround: ranking inside the stream would need
    a non-mergeable global order over all keys per micro-batch, while
    counters are mergeable update-mode state and the sink-side top-k
    reads |keys| rows, exactly like ZREVRANGE reads a Redis zset.
    Update-mode emissions only grow, so max-per-key == final count under
    any micro-batch split; the rank is tie-broken on user_id.
    """
    ev = stream_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    updates = run_to_memory(agg, mode="update")
    counters = updates.groupBy("event_type", "user_id").agg(
        F.max("n").cast("long").alias("n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.desc("n"), "user_id")
    return (
        counters.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )


@query(
    "stream_approx_uniques",
    oracle="""
    -- HLL is THE streaming uniques design (PFADD semantics): sketch
    -- state is mergeable and O(kB)/group where an exact distinct would
    -- buffer every id in state forever. Estimate is engine-specific;
    -- the exact-checkable claim is the 10% envelope vs exact counts
    -- (rsd=0.02 requested, ~5 sigma headroom), same discipline as
    -- agg_approx_distinct.
    SELECT date_trunc('day', ts) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_10pct
    FROM events
    GROUP BY 1
    """,
)
def stream_approx_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING unique visitors per day via approx_count_distinct — the
    reference's PFADD/PFCOUNT surface as bounded-state streaming: the
    HLL sketch is mergeable update-mode state, so memory per group is
    the sketch size regardless of how many ids flow through — the 100 TB
    streaming-uniques answer (exact distinct on a stream buffers every
    id in the state store forever). Per-batch estimates only grow, so
    max-per-key is the final sketch value; the deterministic claim is
    the exact count plus a within-envelope boolean, exactly like the
    batch twin agg_approx_distinct. (Exact distinct is NOT legal inside
    a streaming aggregation — Spark rejects it because its state is
    unmergeable and unbounded, which is the point — so the exact
    reference values come from the batch twin of the same fixture.)
    """
    from .runner import batch_table

    ev = stream_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.approx_count_distinct("user_id", 0.02)
        .cast("long")
        .alias("approx_users"),
    )
    updates = run_to_memory(agg, mode="update")
    final = updates.groupBy("day").agg(
        F.max("approx_users").cast("long").alias("approx_users"),
    )
    exact = (
        batch_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
    )
    # Null-SAFE join: this groupBy keys on a plain column (not a time
    # window), so clock-less events (NULL ts, hostile fixture r7) DO form
    # a NULL day group in streaming state; a plain equi-join on `day`
    # would drop that bucket while the oracle emits it.
    return final.join(exact, final["day"].eqNullSafe(exact["day"])).select(
        final["day"],
        "exact_users",
        (
            (F.col("approx_users") >= F.round(F.col("exact_users") * 0.9))
            & (F.col("approx_users") <= F.round(F.col("exact_users") * 1.1))
        ).alias("within_10pct"),
    )


@query(
    "stream_late_deadletter",
    oracle="""
    -- batch truth of the late set: the staged source replays on-time
    -- days 11-20 as micro-batch 1, days >= 21 as micro-batch 2, and the
    -- day <= 10 stragglers as micro-batch 3. The dedup ingest's
    -- late-event watermark for batch 3 (the PREVIOUS batch's watermark,
    -- Spark's two-watermark design) stands ~10 days past every
    -- straggler, so the late set is exactly the day <= 10 rows — each
    -- dropped by the operator AND landed in the dead-letter table.
    -- deadletter_ok asserts telemetry == dead-letter:
    -- sum(numRowsDroppedByWatermark) over the run equals the
    -- dead-letter row count, the run really split into >= 3
    -- micro-batches, and the drop count is non-zero (a degenerate
    -- single-batch run, where the watermark never advances and nothing
    -- drops, FAILS the gate).
    SELECT event_type,
           CAST(date_part('day', ts) AS BIGINT) AS d,
           CAST(count(*) AS BIGINT) AS n,
           true AS deadletter_ok
    FROM events
    WHERE date_part('day', ts) <= 10
    GROUP BY 1, 2
    """,
)
def stream_late_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-DATA ACCOUNTING (VERDICT r6 task 5): watermark drops must be
    OBSERVABLE, not silent. At 100 TB a misconfigured upstream that
    replays yesterday's partition into today's stream silently loses
    every row to the watermark — an ops incident nothing surfaces unless
    the pipeline (a) counts drops and (b) lands the dropped rows
    somewhere queryable. This op composes the two halves VERDICT r6
    names: the `numRowsDroppedByWatermark` state-operator metric from
    the query's progress telemetry for the counting, and the
    snk_observe_audit side-output pattern for the landing — here a
    foreachBatch dead-letter writer into a MiniLog table with txn =
    batch_id (exactly-once under replay, operators/acid_ops.py
    contract).

    The accounting operator is the watermarked DEDUP ingest
    (dropDuplicates on (event_id, ts) — the ZMQ-redelivery-tolerant
    shape of stream_dedup): measured on this build (4.1.2), the
    windowed AGGREGATION admits late rows (it aggregates and emits
    them; numRowsDroppedByWatermark stays 0 — late-input filtering for
    aggregates is best-effort by spec), while the dedup operator
    enforces the drop and counts it. Measured along the way, and load-
    bearing for the staging below: the drop filter uses the PREVIOUS
    batch's watermark, not the current one (the two-watermark
    late-events/eviction split, visible as
    watermarkPredicateForDataForLateEvents in the plan) — so a late
    file must arrive at least TWO batches after the on-time data it
    trails.

    Determinism: the fixture is staged as THREE source files with
    ordered mtimes — days 11-20, then days >= 21, then the day <= 10
    stragglers — and maxFilesPerTrigger=1 forces one micro-batch each
    (AvailableNow honors source read limits). Batch 3's late-event
    watermark is at least max(days 11-20) − 1h ≈ Jan 20, ~10 days past
    every straggler, and the batch-2 file (days >= 21) sits fully above
    every candidate watermark, so the late set is exactly the day <= 10
    rows regardless of the engine's <-vs-<= boundary convention or
    which prior batch's watermark applies.

    The dead-letter writer mirrors the two-watermark mechanics on the
    driver (late watermark for batch k = max event time through batch
    k−2, minus the delay), tagging each batch's sub-watermark rows
    before appending them — the documented production recipe for
    dead-lettering, since the stateful operator has no side output for
    the rows it drops.
    """
    import os
    import shutil
    import tempfile

    from ..acid import MiniLogTable
    from ..session import tune
    from .runner import run_foreach_batch

    tune(spark)
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(
        tempfile.gettempdir(),
        "bootic_late_dl",
        f"{tag}-{st.st_size}-{st.st_mtime_ns}-v2",
    )
    marker = os.path.join(root, "_READY")
    sdir = os.path.join(root, "stream")
    info_path = os.path.join(root, "_DL_INFO")
    if not os.path.exists(marker):
        if os.path.exists(root):
            shutil.rmtree(root)
        os.makedirs(sdir)
        dl = MiniLogTable(
            spark, os.path.join(root, "deadletter"), stats_cols=("d",)
        )
        ev = table(spark, sf_dir, "events").select(
            "event_id", "event_type", "user_id", "ts"
        )
        splits = [
            ("00_ontime", F.dayofmonth("ts").between(11, 20)),
            ("01_advance", F.dayofmonth("ts") >= 21),
            ("02_late", F.dayofmonth("ts") <= 10),
        ]
        for i, (name, pred) in enumerate(splits):
            tmp = os.path.join(root, f"_tmp_{name}")
            ev.filter(pred).coalesce(1).write.parquet(tmp)
            part = next(
                n for n in os.listdir(tmp) if n.endswith(".parquet")
            )
            dst = os.path.join(sdir, f"{name}.parquet")
            os.rename(os.path.join(tmp, part), dst)
            shutil.rmtree(tmp)
            # FileStreamSource admits oldest-mtime first: the straggler
            # file must arrive two batches after the on-time data (the
            # late filter lags one batch behind the eviction watermark)
            t = 1_700_000_000 + i * 3600
            os.utime(dst, (t, t))

        schema = spark.read.parquet(sdir).schema

        def src():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(sdir)
            )

        # half 1: the watermarked dedup ingest, telemetry captured
        dedup = (
            src()
            .withWatermark("ts", "1 hour")
            .dropDuplicates(["event_id", "ts"])
        )
        progress: list = []
        run_to_memory(dedup, mode="append", progress_sink=progress)
        n_dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in progress
            for op in (p.get("stateOperators") or [])
        )
        n_batches = sum(1 for p in progress if p.get("numInputRows"))

        # half 2: the dead-letter side output — the driver mirrors the
        # two-watermark mechanics (late watermark for batch k = max
        # event time through batch k-2, minus the delay); sub-watermark
        # rows are appended exactly-once via txn=batch_id
        wm_hist: list = []  # max event ts of each completed batch

        def land(batch_df: DataFrame, batch_id: int) -> None:
            prior = [t for t in wm_hist[:-1] if t is not None]
            if prior:
                late = batch_df.filter(
                    F.col("ts")
                    < F.lit(max(prior)) - F.expr("interval 1 hour")
                )
            else:
                late = batch_df.limit(0)
            dl.append(
                late.select(
                    "event_id",
                    "event_type",
                    F.dayofmonth("ts").cast("long").alias("d"),
                ),
                txn={"app": "deadletter", "version": int(batch_id)},
            )
            mx = batch_df.agg(F.max("ts").alias("m")).collect()[0]["m"]
            wm_hist.append(mx)

        run_foreach_batch(src(), land, mode="append")
        n_deadletter = dl.read().count()
        with open(info_path, "w") as fh:
            import json

            json.dump(
                {
                    "n_dropped": n_dropped,
                    "n_deadletter": n_deadletter,
                    "n_batches": n_batches,
                },
                fh,
            )
        with open(marker, "w") as fh:
            fh.write("ok")
    import json

    dl = MiniLogTable(
        spark, os.path.join(root, "deadletter"), stats_cols=("d",)
    )
    with open(info_path) as fh:
        info = json.load(fh)
    deadletter_ok = (
        info["n_dropped"] == info["n_deadletter"]
        and info["n_batches"] >= 3
        and info["n_dropped"] > 0
    )
    return (
        dl.read()
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "event_type", "d", "n",
            F.lit(bool(deadletter_ok)).alias("deadletter_ok"),
        )
    )
