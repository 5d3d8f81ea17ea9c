"""Joins (SURVEY.md §2.4).

The reference has NO joins (single denormalized event stream); this is the
capability a real engine adds. Physical-strategy intent, per query:

- dims (region/nation/supplier/part/customer-at-test-SF) -> ``broadcast()``
  hint so the planner picks BroadcastHashJoin (no shuffle of the fact side);
- fact⋈fact -> shuffle join on the key, AQE free to pick SMJ/SHJ and to
  split skewed partitions;
- theta/range joins keep the small side broadcast so the nested-loop join
  never materializes a cross product of two large inputs;
- as-of join: Spark has no native operator — implemented as the
  union + last(ignorenulls) window trick, which is a single shuffle on
  (user_id) + one sort, NOT a join at all (scales linearly; the naive
  join+row_number approach shuffles the pair blow-up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..helpers import dsum, lcount, oracle_dsum, oracle_rev_sum, rev_sum
from ..io import table
from ..registry import query


@query(
    "join_broadcast",
    oracle=f"""
    SELECT
      p_brand,
      CAST(count(*) AS BIGINT) AS n_items,
      {oracle_dsum('l_extendedprice', 'revenue')}
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim): lineitem x part, revenue per brand.

    The dim side ships to every executor once; the 100 TB fact side is
    never shuffled. tests/test_plans.py asserts BroadcastHashJoin.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(lcount("n_items"), dsum("l_extendedprice", "revenue"))
    )


@query(
    "join_shuffle",
    oracle=f"""
    SELECT
      o_orderstatus,
      o_orderpriority,
      CAST(count(*) AS BIGINT) AS n_items,
      {oracle_rev_sum('revenue')}
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact: both sides shuffle on the join key; AQE picks the
    algorithm (and demotes to broadcast at toy scale — that's correct too)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(lcount("n_items"), rev_sum("revenue"))
    )


@query(
    "join_multiway",
    oracle=f"""
    SELECT
      r_name,
      n_name,
      CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
      {oracle_rev_sum('revenue')}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY r_name, n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join: revenue per region/nation.

    Catalyst chains the broadcast dims onto the fact pipeline in one stage;
    only orders⋈lineitem induces a shuffle.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            rev_sum("revenue"),
        )
    )


@query(
    "q3_topk_join",
    oracle=f"""
    SELECT
      l_orderkey,
      {oracle_rev_sum('revenue')},
      date_trunc('day', o_orderdate) AS order_day
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, order_day
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3-style: join + group + top-10 (BASELINE.md headline query).

    TakeOrderedAndProject gives the top-10 without a full global sort.

    Build-side discipline (r6 scale bench finding): the l_shipdate filter
    keeps ~53% of lineitem, but Catalyst's stats estimate put the filtered
    fact side under the broadcast threshold and planned BuildRight on
    LINEITEM — a 3.2M-row broadcast build that cost 1.2 s of the 1.6 s
    query at 10x sf0.1 and would OOM outright on a cluster. The explicit
    ``broadcast()`` hint pins the build to the customer⋈orders projection
    (selective filters on both inputs, 2 carried columns — the side that
    is ALWAYS the small one at any scale), so lineitem streams map-side:
    measured 1.57 s -> 0.44 s at 10x. Never broadcast the fact side.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    co = F.broadcast(
        c.join(o, c.c_custkey == o.o_custkey).select("o_orderkey", "o_orderdate")
    )
    return (
        co.join(li, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", F.date_trunc("day", "o_orderdate").alias("order_day"))
        .agg(rev_sum("revenue"))
        .select("l_orderkey", "revenue", "order_day")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "join_left_right_outer",
    oracle="""
    SELECT
      c_custkey,
      c_mktsegment,
      CAST(count(o_orderkey) AS BIGINT) AS n_orders,
      count(o_orderkey) > 0 AS has_orders
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer join with null-padding: every customer, zero-order ones kept."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").cast("long").alias("n_orders"),
            (F.count("o_orderkey") > 0).alias("has_orders"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join: probe side streamed, no row duplication."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join (customers that never ordered)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


#: Price bands for the range join — a tiny in-memory dim, always broadcast.
PRICE_BANDS = [
    ("p00_cheap", 0.0, 1_000.0),
    ("p01_mid", 1_000.0, 10_000.0),
    ("p02_high", 10_000.0, 50_000.0),
    ("p03_lux", 50_000.0, 1e12),
]


@query(
    "join_theta_range",
    oracle=f"""
    SELECT
      b.band,
      CAST(count(*) AS BIGINT) AS n_items,
      {oracle_dsum('l_extendedprice', 'revenue')}
    FROM lineitem
    JOIN (VALUES
      ('p00_cheap', 0.0, 1000.0),
      ('p01_mid', 1000.0, 10000.0),
      ('p02_high', 10000.0, 50000.0),
      ('p03_lux', 50000.0, 1e12)
    ) AS b(band, lo, hi)
      ON l_extendedprice >= b.lo AND l_extendedprice < b.hi
    GROUP BY b.band
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range-band) join: BroadcastNestedLoopJoin with a 4-row dim.

    At 100 TB the fact side streams through; the only safe theta join is one
    with a broadcastable side — never two large inputs.
    """
    li = table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    price = F.col("l_extendedprice")
    return (
        li.join(F.broadcast(bands), (price >= F.col("lo")) & (price < F.col("hi")))
        .groupBy("band")
        .agg(lcount("n_items"), dsum("l_extendedprice", "revenue"))
    )


def _asof_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared scaffold for the as-of family: views (kind 0, carrying their
    own ts as the payload) unioned with clicks (kind 1, NULL payload).
    Views sort before clicks at equal ts so ``<=``/``>=`` semantics admit
    the simultaneous view in either scan direction."""
    ev = table(spark, sf_dir, "events")
    # NULL-keyed views are excluded: SQL join equality never matches NULL
    # = NULL, but Window.partitionBy groups NULLs together — without the
    # filter a NULL-user click would inherit a NULL-user view's timestamp
    # (hostile-fixture sweep finding, r5). NULL-keyed CLICKS stay: they are
    # left-join output rows, and their partition then holds no views, so
    # the carry-forward is correctly NULL.
    views = ev.filter(
        (F.col("event_type") == "view") & F.col("user_id").isNotNull()
    ).select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind"),
        F.col("ts").alias("view_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    return views.unionByName(clicks)


def _asof_window(descending: bool = False):
    """Carry-forward frame per user: ascending scan carries the latest
    view at-or-BEFORE each row; descending carries the earliest view
    at-or-AFTER (kind stays ascending so the simultaneous view wins in
    both directions)."""
    order = (
        [F.col("ts").desc(), F.col("kind").asc(), F.col("event_id")]
        if descending
        else [F.col("ts"), F.col("kind"), F.col("event_id")]
    )
    return (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


@query(
    "join_asof",
    oracle="""
    SELECT
      c.event_id AS click_id,
      c.user_id,
      date_trunc('second', c.ts) AS click_sec,
      date_trunc('second', v.ts) AS asof_view_sec
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the user's most recent view at-or-before.

    No native Spark as-of: union both sides, sort within user by
    (ts, kind, event_id) — views sort before clicks at equal ts to match the
    oracle's ``<=`` — and carry the last non-null view ts forward. One
    shuffle + one sort, linear in input (no pair blow-up). Oracle: DuckDB's
    native ASOF JOIN.
    """
    merged = _asof_union(spark, sf_dir).withColumn(
        "asof_view_ts", F.last("view_ts", ignorenulls=True).over(_asof_window())
    )
    return merged.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.date_trunc("second", "ts").alias("click_sec"),
        F.date_trunc("second", "asof_view_ts").alias("asof_view_sec"),
    )


@query(
    "join_cross",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (tiny x tiny only — building block for §2.9)."""
    a = table(spark, sf_dir, "region").select(F.col("r_name").alias("r1"))
    b = table(spark, sf_dir, "region").select(F.col("r_name").alias("r2"))
    return a.crossJoin(b)


@query(
    "join_skew_salted",
    oracle="""
    SELECT
      c.c_mktsegment,
      CAST(count(*) AS BIGINT) AS n_events,
      round(CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE)
            / 100.0, 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated shuffle join: salt the hot fact keys, replicate the
    other side (SURVEY.md §7.3).

    ``events.user_id`` is a hot-key column (a few users dominate). A plain
    shuffle join sends every row of a hot key to ONE reducer; at 100 TB the
    straggler partition decides the job's wall-clock. Salting splits each
    key into ``S`` shuffle keys: the fact side gets a deterministic salt in
    [0, S), the customer side is exploded xS so every (key, salt) pair still
    finds its match. Results are identical to the unsalted join (the oracle
    runs the plain join) — only the shuffle distribution changes. AQE's
    skew-split handles mid-size skew automatically; explicit salting is the
    tool when one key exceeds a single executor's memory.
    """
    salt_n = 8
    ev = table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(salt_n)).cast("int")
    )
    cust = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))))
        .withColumn("salt", F.col("salt").cast("int"))
    )
    # hint("merge") pins the cluster-shaped shuffle join (at fixture scale
    # the planner would broadcast customer and no salting would be needed).
    joined = ev.hint("merge").join(
        cust,
        (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt),
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return joined.groupBy("c_mktsegment").agg(
        lcount("n_events"),
        F.round(F.sum(cents).cast("double") / 100.0, 2).alias("total_value"),
    )


@query(
    "join_shuffle_hash",
    oracle="""
    SELECT
      c_mktsegment,
      CAST(count(*) AS BIGINT) AS n_orders,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        AS cents
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third join strategy, pinned: SHUFFLE_HASH builds an in-memory
    hash map per partition instead of sorting both sides (SortMergeJoin) —
    the right call when one side is much smaller than the other but too big
    to broadcast, because it skips both sorts. Plan-asserted as
    ShuffledHashJoin in tests/test_plans.py; broadcast is disabled for the
    build so the hint is actually exercised at fixture scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        c.hint("shuffle_hash")
        .join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents).alias("cents"),
        )
    )


RANGE_EPS_SEC = 1.0  # pair events within 1 second of each other


@query(
    "join_range_bucketed",
    oracle=f"""
    -- brute-force oracle twin: non-equi |dt| <= eps over all pairs
    SELECT
      a.event_id AS a_id,
      b.event_id AS b_id,
      round(abs(epoch(a.ts) - epoch(b.ts)), 6) AS dt_sec
    FROM events a JOIN events b
      ON a.event_id < b.event_id
     AND abs(epoch(a.ts) - epoch(b.ts)) <= {RANGE_EPS_SEC}
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join of two LARGE sides — the range-join optimization:
    neither side is broadcastable at 100 TB and a non-equi join would be a
    nested-loop product, so time is quantized into eps-sized buckets, one
    side explodes to its 3 neighbor buckets, and the pair space collapses
    to a bucket EQUI-join + residual |dt| <= eps filter. Every qualifying
    pair matches in exactly one bucket (the left row's own), so no dedup is
    needed. Cost: 3x one side's rows through one shuffle — linear, not
    quadratic; the oracle replays the brute-force scan at fixture scale.
    """
    ev = table(spark, sf_dir, "events")
    sec = F.col("ts").cast("double")
    bucket = F.floor(sec / RANGE_EPS_SEC).cast("long")
    a = ev.select(
        F.col("event_id").alias("a_id"), sec.alias("a_sec"), bucket.alias("bk")
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        sec.alias("b_sec"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bk"),
    )
    return (
        a.join(b, "bk")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_sec") - F.col("b_sec")) <= RANGE_EPS_SEC)
        )
        .select(
            "a_id",
            "b_id",
            F.round(F.abs(F.col("a_sec") - F.col("b_sec")), 6).alias("dt_sec"),
        )
    )


@query(
    "join_null_safe",
    oracle="""
    -- NULL-safe equi-join (IS NOT DISTINCT FROM / <=>): the NULL key
    -- bucket must MATCH across sides, where plain = would drop it.
    -- k10 is NULL for payloads with k % 10 = 7 (deterministic).
    WITH keyed AS (
      SELECT nullif(CAST(json_extract(props, '$.k') AS BIGINT) % 10, 7)
               AS k10,
             user_id, value
      FROM events
    ),
    l AS (
      SELECT k10, CAST(count(*) AS BIGINT) AS n_events
      FROM keyed GROUP BY k10
    ),
    r AS (
      SELECT k10, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM keyed GROUP BY k10
    )
    SELECT l.k10, l.n_events, r.n_users
    FROM l JOIN r ON l.k10 IS NOT DISTINCT FROM r.k10
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (``<=>`` / IS NOT DISTINCT FROM) — the join
    predicate class plain ``=`` silently breaks: with standard equality a
    NULL join key matches NOTHING, so the NULL bucket vanishes from the
    result; dimension keys with honest unknowns need NULL to match NULL.

    Spark plans ``eqNullSafe`` as a true equi-join (hashable — the key is
    wrapped, not turned into a nested loop), so broadcast/SMJ strategies
    and partial aggregation all still apply; the plan is asserted
    cartesian-free fleet-wide. The NULL bucket is synthesized
    deterministically (payload ``k % 10 = 7 -> NULL``) so both engines
    build identical sides.
    """
    ev = table(spark, sf_dir, "events")
    k10 = F.nullif(
        F.get_json_object("props", "$.k").cast("long") % 10, F.lit(7)
    ).alias("k10")
    keyed = ev.select(k10, "user_id", "value")
    left = keyed.groupBy("k10").agg(lcount("n_events"))
    # distinct attribute name on the right: both sides derive from the same
    # parent frame, and identically-named keys would trip self-join column
    # disambiguation
    right = (
        keyed.groupBy("k10")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .withColumnRenamed("k10", "rk10")
    )
    return left.join(
        right, F.col("k10").eqNullSafe(F.col("rk10"))
    ).select("k10", "n_events", "n_users")


#: Runtime-filter confs for join_bloom_pruned, applied around materialize
#: (restored afterwards so the rest of the fleet plans normally). The scan
#: threshold is 0 because the local fixture is MBs, not the 10 GB default —
#: on a real cluster the defaults fire on their own.
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bloom_pruned_plan(spark: SparkSession, sf_dir: str):
    """(joined DataFrame, restore_fn) with runtime bloom-filter confs ON.

    Exposed separately so tests can assert ``might_contain`` in the
    executed plan; callers must invoke restore_fn after materializing.
    """
    # load (and tune) the tables FIRST: table() -> tune() re-applies the
    # fleet confs, so arming the bloom confs must come after or the
    # re-raised broadcast threshold makes the join broadcastable and
    # InjectRuntimeFilter skips it
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = table(spark, sf_dir, "lineitem")

    saved = {}
    for k, v in _BLOOM_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)

    def restore():
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    joined = (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    return joined, restore


@query(
    "join_bloom_pruned",
    oracle="""
    -- runtime bloom-filter join pruning: result identical to the plain
    -- join; the bloom filter only prunes probe rows that cannot match
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime BLOOM-FILTER join pruning — row-level runtime filtering,
    the third pruning tier beside static partition pruning and DPP: the
    selective dim filter (1-URGENT keeps ~20% of orders) builds a bloom
    filter over the surviving join keys, which is pushed into the FACT
    side's scan as ``might_contain`` — probe rows that cannot match die
    at the scan, before paying the shuffle. At 100 TB this is the
    difference between shuffling the whole fact table and shuffling the
    matching fifth. Spark only arms it for big scans (10 GB default), so
    the builder lowers the threshold around materialization and restores
    it; ``tests/test_plans.py`` asserts might_contain in the armed plan.
    The result is frozen via localCheckpoint under the armed confs, so
    what the driver hashes is what the bloom plan computed.
    """
    joined, restore = bloom_pruned_plan(spark, sf_dir)
    try:
        # materialize under the armed confs (planning happens at action
        # time, so the confs must still be set when the job runs)
        return joined.localCheckpoint(eager=True)
    finally:
        restore()


ASOF_TOLERANCE_SEC = 600  # max staleness: match dropped if view older than 10 min


@query(
    "join_asof_tolerance",
    oracle=f"""
    -- as-of join WITH a staleness tolerance (pandas merge_asof semantics):
    -- the most recent view at-or-before each click counts only if it is
    -- at most {ASOF_TOLERANCE_SEC} s old; staler matches become NULL
    WITH raw AS (
      SELECT c.event_id AS click_id, c.user_id,
             date_trunc('second', c.ts) AS click_sec,
             date_trunc('second', v.ts) AS asof_view_sec,
             -- whole-second age, matching Spark's unix_timestamp (which
             -- floors to seconds BEFORE subtracting): a fractional age
             -- straddling the threshold must not flip fresh/stale
             -- between engines (ADVICE r3)
             floor(epoch(c.ts)) - floor(epoch(v.ts)) AS age_sec
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON c.user_id = v.user_id AND v.ts <= c.ts
    )
    -- column order mirrors the Spark select exactly (click_sec,
    -- asof_view_sec, dropped_stale) for positional schema compares;
    -- the CASE reads the raw-CTE asof_view_sec before the alias shadows
    -- it, and dropped_stale reads only age_sec, never the shadowed alias
    SELECT click_id, user_id, click_sec,
           CASE WHEN age_sec <= {ASOF_TOLERANCE_SEC} THEN asof_view_sec
                ELSE NULL END AS asof_view_sec,
           coalesce(age_sec > {ASOF_TOLERANCE_SEC}, FALSE) AS dropped_stale
    FROM raw
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas ``merge_asof(tolerance=)``
    semantics): attribution windows expire — a click ten minutes after
    the last view is organic, not attributed — so the carried-forward
    match is kept only while fresher than {ASOF_TOLERANCE_SEC} s, else
    nulled (with a flag distinguishing "stale-dropped" from "never had a
    view"). Same single-shuffle union + last(ignorenulls) carry-forward
    as join_asof — the tolerance is a pure post-projection, so the scale
    shape is unchanged (linear, no pair blow-up). Oracle: DuckDB native
    ASOF LEFT JOIN + the same staleness CASE.
    """
    merged = _asof_union(spark, sf_dir).withColumn(
        "asof_view_ts", F.last("view_ts", ignorenulls=True).over(_asof_window())
    )
    age = F.unix_timestamp("ts") - F.unix_timestamp("asof_view_ts")
    fresh = age <= ASOF_TOLERANCE_SEC
    return merged.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.date_trunc("second", "ts").alias("click_sec"),
        F.when(fresh, F.date_trunc("second", "asof_view_ts")).alias(
            "asof_view_sec"
        ),
        (F.col("asof_view_ts").isNotNull() & ~fresh).alias("dropped_stale"),
    )


@query(
    "join_asof_forward",
    oracle="""
    -- FORWARD as-of: for each click, the user's NEXT view at-or-after —
    -- the time-to-next-event shape (response latency, conversion lag)
    SELECT c.event_id AS click_id,
           c.user_id,
           date_trunc('second', c.ts) AS click_sec,
           date_trunc('second', v.ts) AS next_view_sec,
           CAST(floor(epoch(v.ts)) - floor(epoch(c.ts)) AS BIGINT)
             AS wait_sec
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts >= c.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — ``join_asof`` mirrored in time: for each
    click, the user's NEXT view at-or-after (time-to-next-event: response
    latency, conversion lag, retry gaps). Same union + carry-forward
    construction, scanned in DESCENDING time order so the carried view is
    the nearest one at-or-after; views sort before clicks at equal ts
    (kind ascending) because ``>=`` admits the simultaneous view. Still
    one shuffle on user_id + one sort — linear, no pair blow-up; DuckDB's
    native ASOF with ``>=`` replays it.
    """
    merged = _asof_union(spark, sf_dir).withColumn(
        "next_view_ts",
        F.last("view_ts", ignorenulls=True).over(_asof_window(descending=True)),
    )
    return merged.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.date_trunc("second", "ts").alias("click_sec"),
        F.date_trunc("second", "next_view_ts").alias("next_view_sec"),
        (F.unix_timestamp("next_view_ts") - F.unix_timestamp("ts"))
        .cast("long")
        .alias("wait_sec"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    -- NEAREST as-of (pandas merge_asof direction='nearest'): for each
    -- click, the view closest in time in EITHER direction; equidistant
    -- ties resolve to the earlier (backward) view. Ages compare as
    -- whole seconds (floored epochs) to match unix_timestamp semantics.
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
    v AS (SELECT * FROM events WHERE event_type = 'view'),
    b AS (
      SELECT c.event_id AS cid, v.ts AS bts
      FROM c ASOF LEFT JOIN v
        ON c.user_id = v.user_id AND v.ts <= c.ts
    ),
    f AS (
      SELECT c.event_id AS cid, v.ts AS fts
      FROM c ASOF LEFT JOIN v
        ON c.user_id = v.user_id AND v.ts >= c.ts
    ),
    m AS (
      SELECT c.event_id, c.user_id, c.ts, b.bts, f.fts,
             floor(epoch(c.ts)) - floor(epoch(b.bts)) AS back_age,
             floor(epoch(f.fts)) - floor(epoch(c.ts)) AS fwd_age
      FROM c
      JOIN b ON c.event_id = b.cid
      JOIN f ON c.event_id = f.cid
    )
    SELECT event_id AS click_id, user_id,
           date_trunc('second', ts) AS click_sec,
           date_trunc('second',
             CASE WHEN bts IS NULL THEN fts
                  WHEN fts IS NULL THEN bts
                  WHEN back_age <= fwd_age THEN bts ELSE fts
             END) AS nearest_view_sec,
           CAST(CASE WHEN bts IS NULL THEN fwd_age
                     WHEN fts IS NULL THEN -back_age
                     WHEN back_age <= fwd_age THEN -back_age ELSE fwd_age
                END AS BIGINT) AS offset_sec
    FROM m
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — completes the as-of family (backward
    :func:`join_asof`, forward :func:`join_asof_forward`): each click
    attributes to the view closest in time in either direction, the
    pandas ``merge_asof(direction='nearest')`` semantic (useful when
    clock skew makes "the view just after" as plausible as "just
    before"). Equidistant ties take the earlier view. Built as ONE
    union shuffled ONCE on user_id with two window passes (ascending
    carry-forward = latest view at-or-before, descending = earliest
    view at-or-after) and a pure projection choosing the closer side —
    still linear, no pair blow-up, and Catalyst reuses the single
    hashpartitioning exchange for both sorts. Offset is signed
    (negative = attributed view precedes the click).
    """
    merged = (
        _asof_union(spark, sf_dir)
        .withColumn(
            "back_ts", F.last("view_ts", ignorenulls=True).over(_asof_window())
        )
        .withColumn(
            "fwd_ts",
            F.last("view_ts", ignorenulls=True).over(
                _asof_window(descending=True)
            ),
        )
    )
    back_age = F.unix_timestamp("ts") - F.unix_timestamp("back_ts")
    fwd_age = F.unix_timestamp("fwd_ts") - F.unix_timestamp("ts")
    nearest = (
        F.when(F.col("back_ts").isNull(), F.col("fwd_ts"))
        .when(F.col("fwd_ts").isNull(), F.col("back_ts"))
        .when(back_age <= fwd_age, F.col("back_ts"))
        .otherwise(F.col("fwd_ts"))
    )
    offset = (
        F.when(F.col("back_ts").isNull(), fwd_age)
        .when(F.col("fwd_ts").isNull(), -back_age)
        .when(back_age <= fwd_age, -back_age)
        .otherwise(fwd_age)
    )
    return merged.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.date_trunc("second", "ts").alias("click_sec"),
        F.date_trunc("second", nearest).alias("nearest_view_sec"),
        offset.cast("long").alias("offset_sec"),
    )


#: Interval-overlap join: attention windows opened by a view (10 min) vs
#: consideration windows opened by a purchase (5 min), overlapping for the
#: same user. Bucket width = the longer interval so each interval spans at
#: most 2 buckets.
OVERLAP_VIEW_SEC = 600.0
OVERLAP_BUY_SEC = 300.0
_OVL_W = 600.0


@query(
    "join_interval_overlap",
    oracle=f"""
    -- brute-force oracle twin: interval intersection over all same-user
    -- pairs; the engine side must produce exactly these pairs via the
    -- bucketed equi-join
    SELECT v.event_id AS view_id,
           p.event_id AS buy_id,
           v.user_id AS user_id,
           round(least(epoch(v.ts) + {OVERLAP_VIEW_SEC},
                       epoch(p.ts) + {OVERLAP_BUY_SEC})
                 - greatest(epoch(v.ts), epoch(p.ts)), 6) AS overlap_sec
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND epoch(v.ts) <= epoch(p.ts) + {OVERLAP_BUY_SEC}
     AND epoch(p.ts) <= epoch(v.ts) + {OVERLAP_VIEW_SEC}
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join of two large sides — the general form of the
    range join (join_range_bucketed pairs POINTS; this pairs INTERVALS,
    the session-vs-promotion / ad-exposure-vs-visit shape). A naive
    overlap predicate is a nested-loop product, so both interval sets
    explode to the fixed-width time buckets they span and the pair space
    collapses to a (user, bucket) EQUI-join + residual overlap filter.
    The multi-bucket dedup problem — an overlapping pair co-occurs in
    every shared bucket — is solved WITHOUT a distinct: a pair is emitted
    only in the bucket containing ``greatest(starts)``, which overlap
    guarantees lies in both intervals, so each pair survives exactly
    once and the plan stays a single shuffle. Cost: <= 2x rows per side
    (interval length / bucket width + 1), linear at any scale; skewed
    users split further by sub-bucketing the hot keys (the salting
    pattern from join_skew_salted composes).
    """
    ev = table(spark, sf_dir, "events")
    sec = F.col("ts").cast("double")

    def side(etype: str, length: float, id_alias: str, s_alias: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(id_alias),
                "user_id",
                sec.alias(s_alias),
                F.explode(
                    F.sequence(
                        F.floor(sec / _OVL_W).cast("long"),
                        F.floor((sec + length) / _OVL_W).cast("long"),
                    )
                ).alias("bk"),
            )
        )

    v = side("view", OVERLAP_VIEW_SEC, "view_id", "v_s")
    p = side("purchase", OVERLAP_BUY_SEC, "buy_id", "p_s")
    g = F.greatest(F.col("v_s"), F.col("p_s"))
    return (
        v.join(p, ["user_id", "bk"])
        .filter(
            (F.col("v_s") <= F.col("p_s") + OVERLAP_BUY_SEC)
            & (F.col("p_s") <= F.col("v_s") + OVERLAP_VIEW_SEC)
            & (F.floor(g / _OVL_W).cast("long") == F.col("bk"))
        )
        .select(
            "view_id",
            "buy_id",
            "user_id",
            F.round(
                F.least(
                    F.col("v_s") + OVERLAP_VIEW_SEC,
                    F.col("p_s") + OVERLAP_BUY_SEC,
                )
                - g,
                6,
            ).alias("overlap_sec"),
        )
    )
