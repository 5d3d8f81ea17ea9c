"""100 TB storage layout (SURVEY.md §7.3), demonstrated at fixture scale.

The reference daemon has no storage layout at all — Redis keys encode the
time bucket (`[REF⟂ aggregates/keys.go]`). At 100 TB the equivalent
decision is the *table layout*, and it is the single highest-leverage
performance choice on a cluster:

- ``events`` partitioned by ``event_date``: a dashboard query for one day
  touches 1/30th (or 1/3650th) of the files — Catalyst turns the predicate
  into a ``PartitionFilters`` entry and never lists the other directories.
- fact tables bucketed by join key: ``orders`` ⋈ ``lineitem`` on
  ``o_orderkey`` with both sides pre-bucketed into the same number of
  buckets is a *shuffle-free* sort-merge join — at 100 TB that removes the
  dominant all-to-all network stage entirely.

The fixture parquet is a single unpartitioned file per table, so this module
materializes the scaled layout once per scale factor under ``/tmp`` (content
is a pure function of the fixture, so a ``_SUCCESS``-marked directory is
reusable across sessions), and the registered queries prove the two plan
properties (pruning, no Exchange) against the DuckDB oracle on the original
tables — same rows, different physics.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import table
from .registry import query
from .session import tune

_LAYOUT_ROOT = os.environ.get("SPARK_GRAFT_LAYOUT_DIR", "/tmp/spark_graft_layout")


def _fingerprint(sf_dir: str, name: str) -> str:
    """Content fingerprint of a fixture file (mtime ns + size).

    Baked into every materialized-layout path so a REGENERATED fixture can
    never be served a stale layout (ADVICE r1 — the r1 cache keyed only on
    the sf-dir basename)."""
    st = os.stat(os.path.join(sf_dir, f"{name}.parquet"))
    return f"{st.st_mtime_ns:x}-{st.st_size:x}"

#: Buckets for the co-located join demo. On a cluster this would be sized so
#: one bucket ≈ one HDFS block per file (e.g. 4096 buckets for 100 TB);
#: locally it just needs to exceed 1 to prove bucket-wise execution.
_N_BUCKETS = 8


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf"


def publish_atomic(tmp: str, out: str) -> None:
    """Publish a freshly staged directory with one atomic rename.

    On rename failure: either we lost the publish race to an identical
    _SUCCESS-marked copy (fine — discard ours), or a stale half-written
    directory from a crashed legacy direct write squats at ``out``. Only a
    _SUCCESS marker proves the occupant is complete; otherwise evict it and
    retry so readers never see a partial layout (ADVICE r2)."""
    try:
        os.rename(tmp, out)
    except OSError:
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            shutil.rmtree(out, ignore_errors=True)
            os.rename(tmp, out)


def partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` re-materialized as ``.../events_by_date/event_date=*/``.

    Written once per scale factor; later sessions reuse the directory.
    """
    out = os.path.join(
        _LAYOUT_ROOT,
        _sf_tag(sf_dir),
        f"events_by_date-{_fingerprint(sf_dir, 'events')}",
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        # write to a session-unique temp dir, publish with one atomic rename:
        # a concurrent session either wins the rename or discards its copy —
        # no reader can ever observe a half-written directory (ADVICE r1)
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        ev = table(spark, sf_dir, "events")
        (
            ev.withColumn("event_date", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(tmp)
        )
        publish_atomic(tmp, out)
    return spark.read.parquet(out)


def bucketed_table(spark: SparkSession, sf_dir: str, name: str, key: str) -> str:
    """Materialize ``name`` bucketed+sorted by ``key``; returns the catalog
    table name. Bucketing metadata lives in the session catalog, so this is
    per-session (cheap at fixture scale; a one-time ETL step on a cluster).
    """
    fp = _fingerprint(sf_dir, name).replace("-", "_")
    tbl = f"bkt_{_sf_tag(sf_dir).replace('.', '_')}_{name}_{fp}"
    if not spark.catalog.tableExists(tbl):
        # bucket METADATA only exists in the session catalog (an external
        # createTable can't carry a bucket spec), so the data files are
        # per-process too: pid in the path removes the concurrent-writer
        # race, the fingerprint in the name removes staleness (ADVICE r1)
        path = os.path.join(_LAYOUT_ROOT, "tables", f"{tbl}-{os.getpid()}")
        (
            table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(_N_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(tbl)
        )
    return tbl


@query(
    "src_partition_pruned",
    oracle="""
    SELECT
      CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
      event_type,
      CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY 1, 2
    """,
)
def src_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily counters off the date-partitioned layout: the date predicate
    becomes a PartitionFilter (see tests/test_plans.py) — 27 of 30 day
    directories are never listed, the 100 TB equivalent of the reference
    reading one Redis day-bucket key instead of scanning history."""
    tune(spark)
    ev = partitioned_events(spark, sf_dir)
    return (
        ev.filter(F.col("event_date").between("2024-01-10", "2024-01-12"))
        .groupBy(F.col("event_date").cast("string").alias("event_date"), F.col("event_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT
      o.o_orderpriority,
      CAST(count(*) AS BIGINT) AS n_items,
      CAST(round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                 / 100.0, 2) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact with both sides bucketed by the join key: the sort-merge
    join runs bucket-to-bucket with NO shuffle exchange on either side
    (asserted in tests/test_plans.py). This is the layout that keeps the
    orders⋈lineitem join viable at 100 TB."""
    tune(spark)
    o = spark.table(bucketed_table(spark, sf_dir, "orders", "o_orderkey"))
    l = spark.table(bucketed_table(spark, sf_dir, "lineitem", "l_orderkey"))
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    # At fixture scale the planner would broadcast `orders`; at 100 TB
    # neither fact side is broadcastable, so pin the cluster-shaped plan —
    # the merge join then runs bucket-to-bucket with zero Exchange.
    return (
        o.hint("merge").join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            (F.round(F.sum(cents) / 100.0, 2)).cast("double").alias("revenue"),
        )
    )


@query(
    "join_dpp_pruned",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT CAST(ts AS DATE) AS event_date FROM events
    ),
    mondays AS (
      SELECT event_date FROM dim WHERE date_part('dow', event_date) = 1
    )
    SELECT
      e.event_type,
      CAST(count(*) AS BIGINT) AS n_events
    FROM events e
    JOIN mondays m ON CAST(e.ts AS DATE) = m.event_date
    GROUP BY e.event_type
    """,
)
def join_dpp_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the dim-side filter prunes fact
    partitions AT RUNTIME.

    'All events on Mondays' — the date set isn't known until the dim side
    is evaluated, so static pruning can't help; Catalyst broadcasts the
    filtered dim and injects its dates as a DynamicPruning subquery into
    the fact scan's PartitionFilters (asserted in tests/test_plans.py).
    At 100 TB this is the difference between scanning ~4/30 of the fact
    partitions and all of them, for ANY dim-driven date predicate
    (campaign windows, fiscal calendars, holiday tables)."""
    tune(spark)
    ev = partitioned_events(spark, sf_dir)
    # the dim would be its own table at scale; derive it here (tiny scan)
    dim = (
        ev.select("event_date")
        .distinct()
        .filter(F.dayofweek("event_date") == 2)  # Spark: 1=Sun, 2=Mon
    )
    return (
        ev.join(F.broadcast(dim), "event_date")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


def _interleave_sql(x: str, y: str, bits: int) -> str:
    """Morton/Z-order bit interleave as a closed-form integer expression —
    identical text runs on both engines (& | << >> are common syntax)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "layout_zorder",
    oracle=f"""
    -- replay of the Z-value computation + per-tile bounding boxes: a
    -- Z-order tile of 256 consecutive z values must be a 16x16 rectangle
    -- in (user bucket, hour bucket) space — tight on BOTH dimensions
    WITH coords AS (
      SELECT user_id % 256 AS xb,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) % 256 AS yb
      FROM events
    ),
    zvals AS (
      SELECT xb, yb, ({_interleave_sql('xb', 'yb', 8)}) AS z FROM coords
    )
    SELECT CAST(z // 256 AS BIGINT) AS tile,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(xb) AS BIGINT) AS x_lo, CAST(max(xb) AS BIGINT) AS x_hi,
           CAST(min(yb) AS BIGINT) AS y_lo, CAST(max(yb) AS BIGINT) AS y_hi
    FROM zvals
    GROUP BY 1
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton-curve) multi-dimensional clustering — the layout
    trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``: interleaving the
    bits of two predicate dimensions gives ONE sort key whose consecutive
    ranges are small rectangles in BOTH dimensions, so parquet row-group
    min/max stats prune scans for predicates on EITHER column. A plain
    sort clusters only its leading column; at 100 TB the write path is
    ``repartitionByRange(z).sortWithinPartitions(z)`` before the parquet
    write, and every file then carries tight (user, hour) stats. The
    registered query verifies the geometric property the pruning relies
    on: each 256-wide z tile is a 16x16 bounding box (the oracle checks
    every tile's box exactly). The z computation itself is a map-only
    integer expression — shift/mask/or in whole-stage codegen, one hash
    aggregate for the tile stats.
    """
    tune(spark)
    ev = table(spark, sf_dir, "events")
    coords = ev.select(
        (F.col("user_id") % 256).alias("xb"),
        (
            F.floor(F.col("ts").cast("double") / 3600).cast("long") % 256
        ).alias("yb"),
    )
    z = coords.select(
        "xb", "yb", F.expr(_interleave_sql("xb", "yb", 8)).alias("z")
    )
    return (
        z.groupBy(F.expr("CAST(z div 256 AS BIGINT)").alias("tile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("xb").cast("long").alias("x_lo"),
            F.max("xb").cast("long").alias("x_hi"),
            F.min("yb").cast("long").alias("y_lo"),
            F.max("yb").cast("long").alias("y_hi"),
        )
    )
