"""Aggregations (SURVEY.md §2.3) — the reference's core capability.

The reference maintains time-bucketed counters in Redis hashes via per-event
``HINCRBY`` at every granularity (hour/day/month/year key fan-out) plus
unique-visitor sets (SURVEY.md §2.3 ``[REF⟂ tracker.go, keys.go]`` —
reconstructed; /root/reference empty, SURVEY.md §0). Spark-first, those are:

- hash aggregate with partial (map-side) combine — ``agg_count_by_bucket``;
- single-pass multi-granularity grouping sets — ``agg_multi_rollup``
  (the key fan-out loop, without touching each row 4 times);
- exact and HLL distinct — ``agg_distinct_users`` / ``agg_approx_distinct``
  (Redis SADD/SCARD vs PFADD);
- dashboard-shaped pivot — ``agg_pivot``.

Scale: all aggregates here are mergeable (sum/count/min/max/HLL), so the same
plan distributes over any number of partial aggregates; decimal intermediates
make money sums order-independent (helpers.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..helpers import (
    cents,
    charge_sum,
    davg,
    dsum,
    lcount,
    oracle_avg,
    oracle_charge_sum,
    oracle_dsum,
    oracle_rev_sum,
    rev_sum,
)
from ..io import table
from ..registry import query

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


@query(
    "agg_count_by_bucket",
    oracle=f"""
    SELECT
      event_type,
      date_trunc('hour', ts) AS bucket_hour,
      CAST(count(*) AS BIGINT) AS n_events,
      CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users,
      {oracle_dsum('value', 'total_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_count_by_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: per-(event_type, hour) counters — the reference's hot path.

    One scan -> partial hash agg -> shuffle on (type, hour) -> final agg.
    countDistinct expands to a two-phase exact distinct; value sum is an
    exact decimal sum (order-independent at any parallelism).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket_hour")
        )
        .agg(
            lcount("n_events"),
            F.countDistinct("user_id").cast("long").alias("uniq_users"),
            dsum("value", "total_value"),
        )
    )


@query(
    "agg_multi_rollup",
    oracle="""
    SELECT
      CAST(date_part('year', ts) AS BIGINT) AS y,
      CAST(date_part('month', ts) AS BIGINT) AS m,
      CAST(date_part('day', ts) AS BIGINT) AS d,
      CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY ROLLUP (1, 2, 3)
    """,
)
def agg_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All granularities in ONE pass (reference fans out 4 keys per event).

    ``rollup`` = grouping sets (y,m,d), (y,m), (y), () — the planner expands
    rows once; with 100 TB input this is one shuffle, not four.
    """
    ev = table(spark, sf_dir, "events")
    return ev.rollup(
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
    ).agg(lcount("n_events"))


@query(
    "agg_sum_avg_minmax",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {oracle_dsum('l_quantity', 'sum_qty')},
      {oracle_dsum('l_extendedprice', 'sum_base_price')},
      {oracle_rev_sum('sum_disc_price')},
      {oracle_charge_sum('sum_charge')},
      {oracle_avg('l_quantity', 'avg_qty')},
      {oracle_avg('l_extendedprice', 'avg_price')},
      CAST(round(min(l_extendedprice), 2) AS DOUBLE) AS min_price,
      CAST(round(max(l_extendedprice), 2) AS DOUBLE) AS max_price,
      CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_sum_avg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q1-style pricing summary (BASELINE.md headline query).

    Per-row double products are computed with identical association on both
    sides (bit-exact), then cast to decimal so the *sums* are exact and
    order-independent.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            rev_sum("sum_disc_price"),
            charge_sum("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.round(F.min("l_extendedprice"), 2).cast("double").alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).cast("double").alias("max_price"),
            lcount("count_order"),
        )
    )


@query(
    "agg_distinct_users",
    oracle="""
    SELECT
      event_type,
      CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users,
      CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact uniques per type (Redis SADD+SCARD semantics)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("uniq_users"),
        lcount("n_events"),
    )


def approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL uniques (Redis PFADD semantics): mergeable, streaming-safe.

    This — not exact distinct — is the 100 TB path: the sketch is O(kB) per
    group and merges associatively across any partial-aggregation tree.
    Raw estimates; the registered query wraps them in an exact-checkable
    error-envelope framing (the estimate itself is engine-specific, so DuckDB
    cannot reproduce it bit-for-bit — the envelope vs exact counts is the
    deterministic, hashable claim).

    r13 (guide §2.2, §2.3), mechanism corrected r14 (VERDICT r13 item 3):
    with a SINGLE distinct column Catalyst already planned the old form
    as the stacked double-aggregate (partial agg keyed (event_type,
    user_id), then final) — there is NO Expand node in
    plans/r13/agg_approx_distinct_before.txt; Expand appears only for
    MULTIPLE distinct groups. What the explicit pre-group actually buys
    (visible in that before plan, HashAggregate (7) / Exchange (8)): the
    old partial agg ran partial_approx_count_distinct over every EVENT
    row and its exchange carried the 410-word HLL buffer per (type, uid)
    group — a 413-column shuffle row. This form shuffles (event_type,
    user_id, count) — 3 columns — and updates the sketch (and the exact
    count) once per DEDUPLICATED pair in the post-shuffle aggregate.
    Measured 0.85 → 0.45 s noop at sf0.1. exact_users is count(user_id)
    over the groups (one non-null uid per group — NULL uids form their
    own group, counted by neither form), n_events is the rolled-up sum,
    and the HLL sketch over deduplicated uids has IDENTICAL registers
    (set semantics: duplicate hashes update the same register), so the
    estimate is bit-equal.
    """
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return g.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).cast("long").alias("approx_users"),
        F.count("user_id").cast("long").alias("exact_users"),
        F.sum("__c").cast("long").alias("n_events"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    -- The HLL estimate is deterministic for fixed data but engine-specific;
    -- the exact-checkable claim is the error envelope: estimate within 10%
    -- of the exact distinct count (rsd=0.02 requested, ~5 sigma headroom).
    SELECT
      event_type,
      CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      CAST(count(*) AS BIGINT) AS n_events,
      TRUE AS within_10pct
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct with its accuracy claim made exact-checkable:
    exact counts ride along and the estimate is asserted into a
    deterministic within-envelope boolean (see approx_distinct_raw)."""
    raw = approx_distinct_raw(spark, sf_dir)
    return raw.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            (F.col("approx_users") >= F.round(F.col("exact_users") * 0.9))
            & (F.col("approx_users") <= F.round(F.col("exact_users") * 1.1))
        ).alias("within_10pct"),
    )


@query(
    "agg_hll_mergeable",
    oracle="""
    -- Datasketches-HLL day sketches unioned to months: the estimate is
    -- engine-specific, so the exact-checkable claims are (a) the exact
    -- month-level distinct, (b) the day count that was merged, and (c) the
    -- estimate landing inside a 10% envelope (lgK=12 -> rsd ~1.6%, ~6
    -- sigma headroom).
    SELECT
      CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
      CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
      TRUE AS within_10pct
    FROM events
    GROUP BY 1
    """,
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch REUSE across rollup levels — the 100 TB uniques story.

    ``approx_count_distinct`` re-scans raw events for every level;
    datasketches HLL (``hll_sketch_agg`` / ``hll_union_agg``) aggregates
    raw data ONCE into per-day sketches (O(kB) each), then every coarser
    level (month here, quarter/year/all-time the same way) merges the
    stored sketches without touching raw data again — exactly how a daily
    batch pipeline maintains rolling uniques over an unbounded history.
    The estimate is asserted into a deterministic error-envelope boolean
    against the exact count (same framing as agg_approx_distinct).
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    # n_days counts NON-NULL days (F.count skips NULLs) and the join is
    # null-SAFE: clock-less events (NULL ts, hostile-fixture r7) form a
    # NULL month bucket on both engines — count(DISTINCT date_trunc) in
    # SQL ignores the NULL day, and a plain equi-join would silently drop
    # the whole bucket (NULL != NULL).
    monthly = daily.groupBy(F.date_trunc("month", "day").alias("month")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count(F.col("day")).cast("long").alias("n_days"),
    )
    exact = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return monthly.join(
        exact, monthly["month"].eqNullSafe(exact["month"])
    ).select(
        monthly["month"],
        "exact_users",
        "n_days",
        (
            (F.col("approx_users") >= F.round(F.col("exact_users") * 0.9))
            & (F.col("approx_users") <= F.round(F.col("exact_users") * 1.1))
        ).alias("within_10pct"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    HAVING count(*) > 70
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(lcount("n_events"))
        .filter(F.col("n_events") > 70)
    )


@query(
    "agg_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (group-by-all-columns under the hood)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_pivot",
    oracle="""
    SELECT
      date_trunc('day', ts) AS day,
      CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
      CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
      CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
      CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
      CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
    FROM events
    GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts pivoted type->columns (the dashboard-shaped read).

    Pivot values are pinned (no extra distinct-values job — at scale an
    unpinned pivot is a full extra scan).
    """
    ev = table(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )
    return out.select(
        "day", *[F.col(t).cast("long").alias(t) for t in EVENT_TYPES]
    )


@query(
    "agg_cube",
    oracle="""
    SELECT
      event_type,
      CAST(date_part('dow', ts) AS BIGINT) AS dow,
      CAST(count(*) AS BIGINT) AS n_events,
      CAST(grouping(event_type) * 2 + grouping(CAST(date_part('dow', ts)
           AS BIGINT)) AS BIGINT) AS gid
    FROM events
    GROUP BY CUBE (event_type, CAST(date_part('dow', ts) AS BIGINT))
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week): all 4 grouping sets in one
    Expand pass — the dashboard matrix (per type, per weekday, both
    margins, grand total) the reference would need 4 separate key families
    for. ``grouping_id`` disambiguates real NULLs from subtotal rows."""
    ev = table(spark, sf_dir, "events")
    dow = (F.dayofweek("ts") - 1).cast("long")  # Spark 1=Sun -> DuckDB 0=Sun
    return (
        ev.cube(F.col("event_type"), dow.alias("dow"))
        .agg(
            lcount("n_events"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


def approx_percentile_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable percentile sketch (the ONLY percentile allowed on the
    100 TB streaming path — exact percentiles need the full group sorted;
    see agg_percentile for the exact batch twin). Raw estimates; the
    registered query wraps them in the exact-checkable envelope framing."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.approx_percentile("value", F.lit(0.9), F.lit(10000)).alias("p90"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile(value, 0.9)").alias("exact_p90"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    -- Sketch estimates are engine-specific; the deterministic claim is the
    -- GK sketch's ACTUAL guarantee: the estimate's rank is within
    -- eps = 1/accuracy + 1/n of the target rank. (The earlier
    -- within-1%-of-exact-VALUE claim is not what the sketch promises —
    -- a sparse tail or one extreme outlier legitimately breaks it;
    -- hostile-fixture sweep finding, r5.)
    SELECT
      event_type,
      round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS exact_p50,
      round(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS exact_p90,
      TRUE AS p50_rank_ok,
      TRUE AS p90_rank_ok
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile with its accuracy claim made exact-checkable: the
    exact interpolated percentiles ride along (hash-compared vs DuckDB's
    quantile_cont) and each estimate is asserted into a rank-error boolean
    by joining the per-group estimates back onto the rows and counting —
    count(value < est)/n and count(value <= est)/n must bracket the target
    rank within the sketch's eps. Distribution-free, unlike a value-error
    envelope."""
    raw = approx_percentile_raw(spark, sf_dir)
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    # null-safe join key: a NULL event_type group (which GROUP BY emits on
    # both engines) must survive the join back onto the per-group estimates;
    # a plain inner equi-join would drop it (ADVICE r5).
    j = ev.join(
        F.broadcast(raw), ev["event_type"].eqNullSafe(raw["event_type"])
    ).select(ev["event_type"], "value", "p50", "p90", "exact_p50", "exact_p90")

    n = F.count("value").cast("double")  # non-null values only

    def rank_ok(est: str, p: float):
        le = F.count_if(F.col("value") <= F.col(est)).cast("double")
        lt = F.count_if(F.col("value") < F.col(est)).cast("double")
        eps = F.lit(1.0 / 10000) + 1.0 / n
        claim = (le / n >= p - eps) & (lt / n <= p + eps)
        return F.when(n > 0, claim).otherwise(F.lit(True))

    return j.groupBy("event_type").agg(
        F.round(F.first("exact_p50"), 4).cast("double").alias("exact_p50"),
        F.round(F.first("exact_p90"), 4).cast("double").alias("exact_p90"),
        rank_ok("p50", 0.5).alias("p50_rank_ok"),
        rank_ok("p90", 0.9).alias("p90_rank_ok"),
    )


HIST_BUCKET_WIDTH = 50.0
HIST_N_BUCKETS = 10  # values land in [0, 500); bucket = floor(v/50), capped


@query(
    "agg_histogram",
    oracle=f"""
    SELECT
      event_type,
      CAST(least(floor(value / {HIST_BUCKET_WIDTH}),
                 {HIST_N_BUCKETS - 1}) AS BIGINT) AS bucket,
      CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type: the distribution chart a
    dashboard renders from counters. bucket = floor(value/width) is a pure
    projection, so the whole histogram is one partial+final hash aggregate
    — mergeable across partitions/micro-batches like every counter here."""
    ev = table(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / HIST_BUCKET_WIDTH),
        F.lit(HIST_N_BUCKETS - 1),
    ).cast("long")
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(lcount("n"))


@query(
    "agg_grouping_sets",
    oracle="""
    -- arbitrary (non-hierarchical) grouping sets: (type), (dow), ()
    SELECT event_type, NULL AS dow, CAST(count(*) AS BIGINT) AS n_events,
           CAST(1 AS BIGINT) AS gid
    FROM events GROUP BY event_type
    UNION ALL
    SELECT NULL, CAST(date_part('dow', ts) AS BIGINT),
           CAST(count(*) AS BIGINT), CAST(2 AS BIGINT)
    FROM events GROUP BY 2
    UNION ALL
    SELECT NULL, NULL, CAST(count(*) AS BIGINT), CAST(3 AS BIGINT)
    FROM events
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the margins WITHOUT the cross cells (CUBE
    computes all 4 sets; dashboards often want exactly these 3). One Expand
    pass over a single scan, like cube/rollup; grouping_id() disambiguates
    subtotal NULLs from data NULLs."""
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               dow,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(grouping_id(event_type, dow) AS BIGINT) AS gid
        FROM (SELECT event_type,
                     CAST(dayofweek(ts) - 1 AS BIGINT) AS dow
              FROM events)
        GROUP BY GROUPING SETS ((event_type), (dow), ())
        """
    )


#: Count-min sketch shape: 4 independent rows x 512 counters. Hash family is
#: the cross-engine multiplicative-congruential form used by the sampling
#: operators (operators/sampling.py) with distinct public mixing constants
#: (xxhash/murmurish primes), so DuckDB can replay the sketch bit-for-bit.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOPK = 20
CMS_P = 1_000_000_007
CMS_A = [2_654_435_761, 2_246_822_519, 3_266_489_917, 668_265_263]
CMS_B = [1_013_904_223, 374_761_393, 2_654_435_769, 88_675_123]


def _cms_cells_sql(src: str) -> str:
    """(user_id, j, cell) rows for every input row x every sketch row."""
    a = " ".join(f"WHEN {j} THEN {CMS_A[j]}" for j in range(CMS_DEPTH))
    b = " ".join(f"WHEN {j} THEN {CMS_B[j]}" for j in range(CMS_DEPTH))
    return f"""
      SELECT user_id, j,
             ((user_id * (CASE j {a} END) + (CASE j {b} END))
              % {CMS_P}) % {CMS_WIDTH} AS cell
      FROM {src}
      CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS j)
    """


@query(
    "agg_heavy_hitters_cms",
    oracle=f"""
    -- count-min sketch replay: build the 4x512 counter grid, then estimate
    -- every candidate as min over its 4 cells; top-{CMS_TOPK} by estimate
    WITH counters AS (
      SELECT j, cell, count(*) AS cnt
      FROM ({_cms_cells_sql('events')})
      GROUP BY 1, 2
    ),
    est AS (
      SELECT user_id, min(cnt) AS cms_est
      FROM ({_cms_cells_sql('(SELECT DISTINCT user_id FROM events)')}) cc
      JOIN counters USING (j, cell)
      GROUP BY user_id
    ),
    exact AS (
      SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY user_id
    )
    SELECT
      e.user_id,
      CAST(est.cms_est AS BIGINT) AS cms_est,
      CAST(e.exact_cnt AS BIGINT) AS exact_cnt,
      est.cms_est >= e.exact_cnt AS no_underestimate
    FROM est JOIN exact e USING (user_id)
    ORDER BY cms_est DESC, e.user_id
    LIMIT {CMS_TOPK}
    """,
)
def agg_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch — the mergeable frequent-items
    sketch beside the HLL family (``agg_approx_distinct`` /
    ``agg_hll_mergeable``): hot-key detection (who to salt, what to cache)
    without an exact per-key aggregate.

    Scale story: the sketch is a FIXED 4x512 grid of mergeable counts —
    the groupBy(j, cell) partial-aggregates map-side, so the shuffle moves
    at most depth x width rows per map task no matter how many billions of
    events scanned, and day-level sketches union by element-wise addition
    (same counters, further summed). Estimation never underestimates
    (asserted per row); the candidate set here is the exact distinct-key
    list so the oracle can replay the whole pipeline — a 100 TB deployment
    feeds candidates from a sampled or prior-window key list instead.
    The explode is a 4-literal array fan-out (Generate, map-side): no join
    builds the grid.
    """
    ev = table(spark, sf_dir, "events").select("user_id")

    def cells(df: DataFrame) -> DataFrame:
        j = F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("j")
        out = df.select("user_id", j)
        a = F.element_at(F.array(*[F.lit(x) for x in CMS_A]), F.col("j") + 1)
        b = F.element_at(F.array(*[F.lit(x) for x in CMS_B]), F.col("j") + 1)
        return out.withColumn(
            "cell", ((F.col("user_id") * a + b) % CMS_P) % CMS_WIDTH
        )

    counters = cells(ev).groupBy("j", "cell").agg(F.count(F.lit(1)).alias("cnt"))
    est = (
        cells(ev.distinct())
        .join(counters, ["j", "cell"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_est"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            F.col("cms_est").cast("long").alias("cms_est"),
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("no_underestimate"),
        )
        .orderBy(F.desc("cms_est"), "user_id")
        .limit(CMS_TOPK)
    )


#: Composite argmax comparand: total-cents shifted past the key space so a
#: single BIGINT orders by (total, user_id) — DuckDB's arg_max/arg_min take
#: exactly two scalar arguments, so the tie-break must live inside the
#: comparand. Bound: user_id < 1e9 (fixture max ~1e5; a cluster deployment
#: with wider keys raises SHIFT or pre-dedupes totals).
ARGMAX_SHIFT = 1_000_000_000


@query(
    "agg_argmax",
    oracle=f"""
    -- argmax/argmin family: per event type, WHICH user produced the
    -- highest / lowest total value (deterministic tie-break on user_id
    -- folded into a single shifted-BIGINT comparand)
    WITH totals AS (
      SELECT event_type, user_id,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events
      GROUP BY 1, 2
    )
    SELECT
      event_type,
      CAST(arg_max(user_id, cents * {ARGMAX_SHIFT} + user_id) AS BIGINT)
        AS top_user,
      CAST(round(max(cents) / 100.0, 2) AS DOUBLE) AS top_total,
      CAST(arg_min(user_id, cents * {ARGMAX_SHIFT} + user_id) AS BIGINT)
        AS bottom_user,
      CAST(round(min(cents) / 100.0, 2) AS DOUBLE) AS bottom_total
    FROM totals
    GROUP BY event_type
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``max_by`` / ``min_by`` (argmax) — "WHO was the top spender", not
    just "what was the top spend": the lookup every leaderboard panel does
    with a self-join unless the engine has an argmax aggregate.

    Two hash aggregates: per-(type, user) totals in integer cents, then
    one ``max_by``/``min_by`` pass per type. Both are mergeable (max_by
    merges by comparing comparands), so the plan partial-aggregates
    map-side and distributes like any counter. The (total, user) tie-break
    is folded into one shifted BIGINT so Spark and DuckDB order
    identically.
    """
    ev = table(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    # decimal(38,0) comparand: DuckDB auto-promotes BIGINT*BIGINT to
    # HUGEINT, but Spark's long * shift is an ANSI ARITHMETIC_OVERFLOW as
    # soon as |cents| > ~9.2e9 (a single 1e12-valued event suffices —
    # hostile-fixture sweep finding, r5). decimal38 covers the same range
    # as HUGEINT here and max_by/min_by order decimals numerically.
    comp = (
        F.col("cents").cast("decimal(38,0)") * ARGMAX_SHIFT + F.col("user_id")
    )
    return totals.groupBy("event_type").agg(
        F.max_by("user_id", comp).cast("long").alias("top_user"),
        F.round(F.max("cents") / 100.0, 2).cast("double").alias("top_total"),
        F.min_by("user_id", comp).cast("long").alias("bottom_user"),
        F.round(F.min("cents") / 100.0, 2).cast("double").alias("bottom_total"),
    )


@query(
    "agg_filtered",
    oracle=f"""
    -- conditional aggregates in ONE pass (FILTER clause): the reference
    -- keeps separate Redis counters per condition; one scan feeds them all
    SELECT
      event_type,
      CAST(count(*) AS BIGINT) AS n_total,
      CAST(count(*) FILTER (WHERE date_part('hour', ts) BETWEEN 9 AND 17)
           AS BIGINT) AS n_business_hours,
      CAST(count(*) FILTER (WHERE date_part('dow', ts) IN (0, 6))
           AS BIGINT) AS n_weekend,
      CAST(count(DISTINCT user_id) FILTER (WHERE value > 300)
           AS BIGINT) AS uniq_big_spenders,
      round(CAST(sum(CASE WHEN value > 300
                          THEN CAST(round(value * 100) AS BIGINT)
                          ELSE 0 END) AS DOUBLE) / 100.0, 2) AS sum_big_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (FILTER-clause) aggregates — many counters, ONE scan.

    The reference daemon maintains a separate Redis counter per condition
    (business-hours views, weekend orders, big-spender uniques ...) by
    fanning each event into several HINCRBYs `[REF⟂ tracker.go]`. The
    columnar equivalent is a single hash aggregate whose slots are guarded
    by predicates: ``count_if`` / ``sum(CASE ...)`` all fold into the same
    partial-agg pass, so N conditions cost one shuffle, not N scans. All
    slots are mergeable, so the plan distributes unchanged at 100 TB.
    """
    ev = table(spark, sf_dir, "events")
    hour = F.hour("ts")
    dow = F.dayofweek("ts") - 1  # Spark 1=Sun -> DuckDB 0=Sun
    big = F.col("value") > 300
    return ev.groupBy("event_type").agg(
        lcount("n_total"),
        F.count_if(hour.between(9, 17)).cast("long").alias("n_business_hours"),
        F.count_if(dow.isin(0, 6)).cast("long").alias("n_weekend"),
        F.count_distinct(F.when(big, F.col("user_id")))
        .cast("long")
        .alias("uniq_big_spenders"),
        F.round(
            F.sum(F.when(big, cents("value")).otherwise(F.lit(0))).cast("double")
            / 100.0,
            2,
        ).alias("sum_big_value"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    -- bitmap-exact distinct with sketch REUSE: month uniques from merged
    -- day bitmaps; DuckDB replays both levels from raw rows
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS day_uniq
      FROM events GROUP BY 1, 2
    ),
    monthly AS (
      SELECT event_type, date_trunc('month', ts) AS month,
             CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_month
      FROM events GROUP BY 1, 2
    ),
    dsums AS (
      SELECT event_type, date_trunc('month', day) AS month,
             CAST(sum(day_uniq) AS BIGINT) AS sum_day_uniq
      FROM daily GROUP BY 1, 2
    )
    SELECT m.event_type, m.month, m.uniq_month, d.sum_day_uniq
    FROM monthly m JOIN dsums d USING (event_type, month)
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct via bitmaps — the third uniques strategy.

    ``agg_distinct_users`` is exact but its partials are raw key sets;
    ``agg_approx_distinct``/``agg_hll_mergeable`` are mergeable but
    approximate. Bitmaps give both: per (group, bucket-of-4096-ids) the
    partial is a fixed 512-byte bitmap, ``bitmap_or_agg`` merges day ->
    month WITHOUT re-scanning raw events, and ``bitmap_count`` reads off
    exact cardinalities. This is the Redis SETBIT/BITCOUNT uniques pattern
    `[REF⟂ tracker.go SADD]` done columnar. At 100 TB the rollup tree reads
    day-level bitmap partitions (thousands of times smaller than raw
    events) — the same reuse shape as the HLL row, with zero error.
    """
    ev = table(spark, sf_dir, "events")
    bm_day = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.bitmap_bucket_number("user_id").alias("bkt"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    # day -> month merge touches only the small bitmap frames
    month_uniq = (
        bm_day.groupBy(
            "event_type", F.date_trunc("month", "day").alias("month"), "bkt"
        )
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("event_type", "month")
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("uniq_month"))
    )
    sum_day = (
        bm_day.groupBy("event_type", "day")
        .agg(F.sum(F.bitmap_count("bm")).alias("day_uniq"))
        .groupBy("event_type", F.date_trunc("month", "day").alias("month"))
        .agg(F.sum("day_uniq").cast("long").alias("sum_day_uniq"))
    )
    return month_uniq.join(sum_day, ["event_type", "month"])


@query(
    "agg_corr_stats",
    oracle="""
    -- bivariate statistics family: correlation, covariance, regression
    SELECT
      l_returnflag,
      CAST(count(*) AS BIGINT) AS n,
      round(CAST(corr(l_extendedprice, l_quantity) AS DOUBLE), 4)
        AS corr_price_qty,
      round(CAST(covar_samp(l_extendedprice, l_quantity) AS DOUBLE), 2)
        AS covar_price_qty,
      round(CAST(regr_slope(l_extendedprice, l_quantity) AS DOUBLE), 4)
        AS slope,
      round(CAST(regr_intercept(l_extendedprice, l_quantity) AS DOUBLE), 2)
        AS intercept
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / covar / linear regression) per group.

    All four are single-pass mergeable co-moment aggregates (count, means,
    M2, co-M2 partials merge associatively), so one shuffle serves the
    whole family at any scale — the planner fuses them into one hash-agg
    slot set. Rounded before hashing: Spark merges partials in partition
    order while DuckDB folds serially, so the last ~1e-10 relative digits
    are legitimately engine-specific (FIXTURES.md determinism rule 3).

    ANSI caveat (found by the differential harness): under Spark 4's
    default ANSI mode, corr/regr on a SINGLE-ROW or zero-variance group
    raises DIVIDE_BY_ZERO where DuckDB returns NULL. The lineitem
    returnflag groups are huge, so this op is safe; a deployment grouping
    by a high-cardinality key must pre-filter degenerate groups (see
    tests/test_differential.py::test_bivariate_stats_close).
    """
    li = table(spark, sf_dir, "lineitem")
    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        lcount("n"),
        F.round(F.corr(price, qty), 4).alias("corr_price_qty"),
        F.round(F.covar_samp(price, qty), 2).alias("covar_price_qty"),
        F.round(F.regr_slope(price, qty), 4).alias("slope"),
        F.round(F.regr_intercept(price, qty), 2).alias("intercept"),
    )


COLLECT_HEAD = 5  # sorted-prefix length gathered per group


@query(
    "agg_collect_sorted",
    oracle=f"""
    -- deterministic group gathering: the first {COLLECT_HEAD} distinct
    -- user ids per event type, as a CSV string (arrays sort unstably
    -- across engines; a canonical string is hash-comparable)
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           array_to_string(
             list_sort(list(DISTINCT user_id))[1:{COLLECT_HEAD}], ','
           ) AS first_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group gathering (``collect_list``/``collect_set``) made
    deterministic: collected arrays arrive in partition order, so the raw
    aggregate is nondeterministic by construction — the fix is
    ``array_sort`` before anything reads the result, here canonicalized
    further to a bounded CSV prefix so the oracle hash is stable. Scale
    caution baked into the shape: UNBOUNDED collect per group is how OOMs
    happen at 100 TB, so the contract exposes only a fixed-size prefix
    (the full sorted set stays distributed; ``slice`` happens after sort,
    per group, before anything is materialized).
    """
    ev = table(spark, sf_dir, "events")
    gathered = F.slice(
        F.array_sort(F.collect_set("user_id")), 1, COLLECT_HEAD
    )
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.array_join(gathered, ",").alias("first_users"),
    )


@query(
    "agg_unpivot",
    oracle="""
    -- unpivot (melt): the wide per-type counter row back to long form —
    -- the inverse of agg_pivot, needed whenever a dashboard-shaped table
    -- must feed a relational pipeline again
    WITH wide AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
               AS view_n,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS click_n,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS purchase_n
      FROM events GROUP BY 1
    )
    SELECT day, kind, n FROM wide
    UNPIVOT (n FOR kind IN (view_n, click_n, purchase_n))
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of ``agg_pivot``: a dashboard-shaped
    wide row (one column per event type) turned back into long
    (day, kind, n) rows. Spark's ``DataFrame.unpivot`` plans an Expand
    node — each input row fans to one output row per value column in the
    SAME task, so the reshape is map-only: no shuffle beyond the one that
    built the wide table. DuckDB's UNPIVOT drops NULL cells by default and
    Spark keeps them; the wide table here is dense (FILTER counts, never
    NULL) so both engines see identical fan-out.
    """
    ev = table(spark, sf_dir, "events")
    wide = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_if(F.col("event_type") == "view").cast("long").alias("view_n"),
        F.count_if(F.col("event_type") == "click").cast("long").alias("click_n"),
        F.count_if(F.col("event_type") == "purchase")
        .cast("long")
        .alias("purchase_n"),
    )
    return wide.unpivot(
        ["day"], ["view_n", "click_n", "purchase_n"], "kind", "n"
    )


@query(
    "agg_string_agg",
    oracle="""
    -- ordered string aggregation (LISTAGG WITHIN GROUP): deterministic
    -- CSV of sampled user ids per event type
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           string_agg(CAST(user_id AS VARCHAR), ','
                      ORDER BY user_id, event_id) AS ids
    FROM events
    WHERE event_id % 997 = 0
    GROUP BY event_type
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg (SQL:2023, Spark 4) — ordered string
    concatenation per group. Determinism requires WITHIN GROUP (ORDER BY
    ...) with a total order; without it the concatenation order is
    partition arrival order (same trap as collect_list —
    agg_collect_sorted). Bounded input (sampled ids) keeps the strings
    small: unbounded LISTAGG at 100 TB is the same OOM shape as
    unbounded collect, and real deployments cap or bucket it. Exercised
    through the SQL front end since WITHIN GROUP is parser surface.
    """
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               listagg(CAST(user_id AS STRING), ',')
                 WITHIN GROUP (ORDER BY user_id, event_id) AS ids
        FROM events
        WHERE event_id % 997 = 0
        GROUP BY event_type
        """
    )


MAD_K = 3.0  # outlier threshold in MAD units (~2 sigma for normal data)


@query(
    "agg_mad_outliers",
    oracle=f"""
    -- robust outlier accounting: median + MAD per group (immune to the
    -- very outliers being hunted, unlike mean/stddev), then count rows
    -- beyond {MAD_K} MAD units
    WITH med AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             any_value(m.med) AS med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(any_value(m.med) AS DOUBLE), 4) AS med,
           round(CAST(any_value(m.mad) AS DOUBLE), 4) AS mad,
           CAST(count(*) FILTER (
             WHERE abs(e.value - m.med) > {MAD_K} * m.mad
           ) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median + MAD (median absolute
    deviation) instead of mean + stddev — the moment-based pair is
    dragged by the very outliers being hunted; the quantile-based pair is
    breakdown-resistant to 50% contamination. Two exact-percentile
    passes (median, then median of |x - med|) + one broadcast join of
    the tiny per-group stats back onto the scan. Exact interpolated
    percentiles are NOT mergeable — at 100 TB the streaming/rollup path
    swaps in approx_percentile sketches (agg_approx_percentile) and this
    exact twin stays the batch auditor. Both engines interpolate
    linearly (F.percentile == quantile_cont), rounded per rule 3.
    """
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
            "mad"
        ),
    )
    scored = ev.join(F.broadcast(mad), "event_type")
    return scored.groupBy("event_type").agg(
        lcount("n"),
        F.round(F.first("med"), 4).alias("med"),
        F.round(F.first("mad"), 4).alias("mad"),
        F.count_if(
            F.abs(F.col("value") - F.col("med")) > MAD_K * F.col("mad")
        )
        .cast("long")
        .alias("n_outliers"),
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
    -- higher central moments per group, computed from EXPLICIT power
    -- sums on both engines: the builtin skewness/kurtosis aggregates use
    -- different bias corrections per engine (sample vs population), so
    -- the shared ground truth is the raw-moment algebra itself
    WITH moments AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             avg(value) AS m1,
             avg(value * value) AS m2,
             avg(value * value * value) AS m3,
             avg(value * value * value * value) AS m4
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round(CAST(
             (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
             / pow(m2 - m1 * m1, 1.5) AS DOUBLE), 4) AS skew_pop,
           round(CAST(
             (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1)
             / pow(m2 - m1 * m1, 2) - 3 AS DOUBLE), 4) AS kurt_excess_pop
    FROM moments
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per group — distribution-shape
    monitoring (a value distribution that suddenly skews or grows tails
    flags ingestion bugs before averages move). Deliberately computed
    from explicit power sums rather than the builtin aggregates: Spark's
    ``skewness``/``kurtosis`` are population-form while DuckDB's are
    bias-corrected sample-form, so the builtins can NEVER hash-match —
    the raw-moment algebra is the engine-neutral ground truth, and power
    sums are plain mergeable avg slots (one fused hash agg, distributes
    unchanged). Population formulas; rounded per rule 3.
    """
    ev = table(spark, sf_dir, "events")
    v = F.col("value")
    mom = ev.groupBy("event_type").agg(
        lcount("n"),
        F.avg(v).alias("m1"),
        F.avg(v * v).alias("m2"),
        F.avg(v * v * v).alias("m3"),
        F.avg(v * v * v * v).alias("m4"),
    )
    m1, m2, m3, m4 = [F.col(c) for c in ("m1", "m2", "m3", "m4")]
    var = m2 - m1 * m1
    return mom.select(
        "event_type",
        "n",
        F.round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var, 1.5), 4)
        .alias("skew_pop"),
        F.round(
            (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1)
            / F.pow(var, 2)
            - 3,
            4,
        ).alias("kurt_excess_pop"),
    )


@query(
    "agg_mode",
    oracle="""
    -- deterministic per-group MODE: the modal hour-of-day per event type,
    -- ties broken toward the earlier hour. Both engines ship a mode()
    -- aggregate, but its tie choice is explicitly nondeterministic in
    -- each — so the registered op states the tie-break in the plan
    -- (count desc, hour asc) instead of trusting engine luck.
    SELECT event_type, modal_hour, n_at_mode
    FROM (
      SELECT event_type,
             CAST(date_part('hour', ts) AS BIGINT) AS modal_hour,
             CAST(count(*) AS BIGINT) AS n_at_mode,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY count(*) DESC, date_part('hour', ts)
             ) AS rn
      FROM events
      GROUP BY event_type, date_part('hour', ts)
    )
    WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value) per group — here the modal
    hour-of-day per event type (the "when does traffic peak" report).
    Spark 4 and DuckDB both have ``mode()``, but both document arbitrary
    tie choice; a differential-checked engine cannot ship that, so the op
    is the explicit two-phase shape: hash agg to (group, value, n), then
    a per-group top-1 window with a total order (n desc, value asc).
    Scale: the window input is |groups x distinct values| (tiny — 5 types
    x 24 hours), already aggregated; WindowGroupLimit prunes to 1 row per
    group map-side at any cardinality.
    """
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.hour("ts").alias("modal_hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.col("modal_hour")
    )
    return (
        hourly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("modal_hour").cast("long").alias("modal_hour"),
            F.col("n").cast("long").alias("n_at_mode"),
        )
    )


@query(
    "agg_calendar_fill",
    oracle="""
    -- zero-filled daily time series: every (event_type, day) cell in the
    -- corpus' date span, 0 where no events occurred — the gap-filling
    -- reporting shape (charts and window functions break on missing days)
    WITH bounds AS (
      SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
      FROM events
    ),
    days AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT t.event_type, d.day, coalesce(n, 0) AS n_events
    FROM days d
    CROSS JOIN types t
    LEFT JOIN daily USING (event_type, day)
    """,
)
def agg_calendar_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: the dense (event_type x day) grid over the data's
    own date span with explicit zeros — the precondition for any
    moving-average or month-over-month window (missing days silently
    shrink window frames). The date spine is generated IN the plan
    (min/max agg -> sequence -> explode; one row in, |days| rows out — no
    driver-side collect, laziness-gate clean) and cross-joined with the
    distinct-types frame; both sides of that cross join are broadcast-
    sized at ANY corpus scale (days x types, not events). The facts then
    LEFT-join onto the spine so absent cells survive as zeros.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    days = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    spine = days.crossJoin(types)
    return (
        F.broadcast(spine)
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
    )


@query(
    "agg_product",
    oracle="""
    -- multiplicative aggregate: per-order compound discount factor,
    -- EXACT in wide integers. Discounts are 2-decimal, so each line's
    -- keep-fraction is an integer percentage; fixture orders carry up to
    -- 13 lines, so the group product reaches 100^13 = 1e26 — past BIGINT
    -- and past double exactness — hence the HUGEINT fold here and the
    -- DECIMAL(38,0) fold on the Spark side. The double factor is then
    -- derived by the SAME cast+division of the SAME exact integer in
    -- both engines. A log-space first cut hit guaranteed half-way cases
    -- (products of 2-decimal numbers land exactly on the rounding grid,
    -- where exp(sum(ln)) vs native product() round in opposite
    -- directions); a BIGINT fold overflowed at 13 lines.
    WITH folded AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             list_reduce(
               list_prepend(1::HUGEINT,
                 list_transform(list(100 - round(l_discount * 100)),
                                x -> CAST(x AS HUGEINT))),
               (a, b) -> a * b) AS iprod
      FROM lineitem
      GROUP BY l_orderkey
    )
    SELECT l_orderkey, n_lines,
           CAST(iprod AS VARCHAR) AS compound_digits,
           -- millionths = iprod * 10^6 / 100^n == iprod / 10^(2n-6):
           -- folding the 10^6 into the divisor keeps the widest value at
           -- iprod itself (sf0.1's 17-line orders already reach 1e34 —
           -- premultiplying by 1e6 overflowed HUGEINT/DECIMAL(38))
           CAST(CASE WHEN n_lines > 3
                THEN iprod // CAST('1' || repeat('0', CAST(2 * n_lines - 6 AS INT)) AS HUGEINT)
                ELSE iprod * CAST('1' || repeat('0', CAST(6 - 2 * n_lines AS INT)) AS HUGEINT)
                END AS BIGINT) AS compound_e6
    FROM folded
    """,
)
def agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative aggregate (PRODUCT) — compound factors (stacked
    discounts, retention multipliers) that engines with a native
    ``product()`` get for free and Spark must compose. The exact path
    folds the collected integer percentages in DECIMAL(38,0) — integer
    multiplication is commutative and associative exactly, so the result
    is partition-order-independent, and 38 digits cover the fixture's
    worst group (13 lines -> 1e26; an int64 fold overflowed ANSI-mode).
    The 6-decimal factor is derived by EXACT integer division (floor of
    millionths) — a first cut exposed both float failure modes in one op:
    ``exp(sum(ln x))`` flipped 14/14.7k groups at the rounding grid, and
    even the exact product diverged last-ulp once ``pow()`` entered
    (Java Math.pow vs libm). For UNBOUNDED groups the scale path is the
    log-space mergeable form — registered as ``agg_product_logspace``
    (r6), with the tolerance envelope made oracle-checkable there. One
    shuffle on l_orderkey either way.
    """
    li = table(spark, sf_dir, "lineitem")
    ipct = (F.lit(100) - F.round(F.col("l_discount") * 100)).cast("long")
    iprod = F.aggregate(
        F.collect_list(ipct.alias("ipct")),
        F.lit(1).cast("decimal(38,0)"),
        lambda acc, x: (acc * x).cast("decimal(38,0)"),
    )
    # millionths = iprod / 10^(2n-6) (the 10^6 numerator folded into the
    # divisor — premultiplying overflowed DECIMAL(38) at sf0.1's 17-line
    # orders, which reach 1e34 on their own)
    pow10 = lambda digits: F.concat(  # noqa: E731 — exact 10^k as decimal
        F.lit("1"), F.repeat(F.lit("0"), digits)
    ).cast("decimal(38,0)")
    n = F.col("n_lines").cast("int")
    e6 = F.when(
        n > 3,
        F.expr(
            "CAST(iprod div CAST(concat('1', repeat('0',"
            " CAST(2 * n_lines - 6 AS INT))) AS DECIMAL(38,0)) AS BIGINT)"
        ),
    ).otherwise(
        (F.col("iprod") * pow10(6 - 2 * n)).cast("long")
    )
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            iprod.alias("iprod"),
        )
        .select(
            "l_orderkey",
            "n_lines",
            F.col("iprod").cast("string").alias("compound_digits"),
            e6.alias("compound_e6"),
        )
    )


@query(
    "agg_approx_top_k",
    oracle="""
    -- exact replay: the sketch tracks up to 10k distinct items, the
    -- fixture has 5 event types, so the heavy-hitter estimates are exact
    -- and re-ranked deterministically by (count desc, item)
    SELECT day, item, cnt,
           -- COALESCE sentinel: DuckDB v1.0.0 windowed PARTITION BY is
           -- nondeterministic on NULL keys (hostile fixture r7); '-' is
           -- outside the CAST(date) domain.
           CAST(row_number() OVER (
             PARTITION BY COALESCE(day, '-') ORDER BY cnt DESC, item
           ) AS BIGINT) AS rk
    FROM (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             event_type AS item,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events
      GROUP BY 1, 2
    )
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` — Spark 4's native frequent-items SKETCH (the
    third sibling of approx_count_distinct and approx_percentile, and
    the engine-side analog of agg_heavy_hitters_cms's hand-built CMS).
    The sketch state is mergeable, so per-group top-k runs as a normal
    partial/final aggregate — no global sort, no per-group row explosion
    before the agg. Contract discipline, same as agg_approx_distinct:
    the sketch is EXACT while distinct items <= maxItemsTracked (5 types
    vs the 10k default here), and the sketch's own arbitrary tie order
    is normalized by re-ranking the exploded output on (count desc,
    item) — the oracle replays exact counts. At unbounded cardinality
    the estimates carry CMS-style error instead; that regime is
    documented, not silently relied on.
    """
    ev = table(spark, sf_dir, "events")
    sk = ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("day")
    ).agg(F.expr("approx_top_k(event_type, 10)").alias("top"))
    w = Window.partitionBy("day").orderBy(F.desc("cnt"), "item")
    return (
        sk.select("day", F.explode("top").alias("e"))
        .select(
            "day",
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("cnt"),
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
    )


@query(
    "agg_product_logspace",
    oracle="""
    -- The UNBOUNDED-group PRODUCT: log-space mergeable form. The float
    -- estimate itself is engine-specific (exp/ln differ last-ulp between
    -- libm builds), so the hashable claims are the exact integer parts of
    -- the decomposition (n_lines / n_zero / sign) plus the error-envelope
    -- boolean, which the Spark side computes against its own exact
    -- DECIMAL(38,0) fold of the same integer percentages (agg_product's
    -- machinery riding along as the in-plan verifier at test scale).
    WITH f AS (
      SELECT l_orderkey,
             CAST(100 - round(l_discount * 100) AS BIGINT) AS ipct
      FROM lineitem
    )
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE ipct = 0) AS BIGINT) AS n_zero,
           CAST(CASE
             WHEN count(*) FILTER (WHERE ipct = 0) > 0 THEN 0
             WHEN count(*) FILTER (WHERE ipct < 0) % 2 = 1 THEN -1
             ELSE 1 END AS BIGINT) AS sign,
           TRUE AS within_rel_1e9
    FROM f
    GROUP BY l_orderkey
    """,
)
def agg_product_logspace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT for UNBOUNDED groups — the scale path agg_product's
    docstring promises (VERDICT r5 'What's missing' #4).

    agg_product's exact DECIMAL fold collects the group into an array:
    correct for bounded groups (orders have <=17 lines) but a million-line
    group would balloon the collected list. This operator is the mergeable
    decomposition — PRODUCT(x) == CASE any zero -> 0 ELSE (-1)^n_neg *
    exp(SUM(ln|x|)) — built ONLY from distributive aggregates (count,
    filtered count, sum), so it partial-aggregates map-side, merges
    associatively across any partition tree, and carries O(1) state per
    group at any group size. Constant-size state is exactly what the
    streaming/100 TB path needs; the documented cost is float tolerance:
    ln/exp round-trip error grows ~n*ulp, far inside the 1e-9 relative
    envelope asserted here (measured: <4e-14 worst group at sf0.1's
    17-line orders).

    NULL factors are skipped by every aggregate on both engines (SQL
    aggregate semantics); an all-NULL group is the empty product (+1,
    sum_ln coalesced to 0). The envelope boolean compares against the
    exact DECIMAL(38,0) fold in the same plan — the bounded-group twin
    acting as the verifier, droppable at true scale where it cannot run.
    """
    li = table(spark, sf_dir, "lineitem")
    ipct = (F.lit(100) - F.round(F.col("l_discount") * 100)).cast("long")
    keep = ipct.alias("ipct")
    # log-space magnitude over the nonzero factors; ln argument is strictly
    # positive by construction (abs + the != 0 guard), so ANSI-safe.
    ln_abs = F.when(ipct != 0, F.log(F.abs(ipct).cast("double") / 100.0))
    exact_fold = F.aggregate(
        F.collect_list(keep),
        F.lit(1).cast("decimal(38,0)"),
        lambda acc, x: (acc * x).cast("decimal(38,0)"),
    )
    g = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.count(F.when(ipct == 0, True)).cast("long").alias("n_zero"),
        F.count(F.when(ipct < 0, True)).alias("n_neg"),
        F.coalesce(F.sum(ln_abs), F.lit(0.0)).alias("sum_ln"),
        # count of non-NULL factors: the exact twin divides by 100^this
        F.count(ipct).alias("n_factors"),
        exact_fold.alias("iprod"),
    )
    sign = (
        F.when(F.col("n_zero") > 0, F.lit(0))
        .when(F.col("n_neg") % 2 == 1, F.lit(-1))
        .otherwise(F.lit(1))
        .cast("long")
    )
    log_prod = F.when(F.col("n_zero") > 0, F.lit(0.0)).otherwise(
        sign.cast("double") * F.exp(F.col("sum_ln"))
    )
    exact_prod = F.col("iprod").cast("double") / F.pow(
        F.lit(100.0), F.col("n_factors").cast("double")
    )
    within = F.when(
        exact_prod == 0.0, log_prod == 0.0
    ).otherwise(F.abs(log_prod - exact_prod) <= F.abs(exact_prod) * 1e-9)
    return g.select(
        "l_orderkey",
        "n_lines",
        "n_zero",
        sign.alias("sign"),
        within.alias("within_rel_1e9"),
    )
