"""Sorts, limits, set operations (SURVEY.md §2.6).

Scale notes: a global ORDER BY range-partitions by sampled boundaries (no
single-node sort); ORDER BY + LIMIT never sorts globally at all
(TakeOrderedAndProject). Set ops are hash aggregations / joins underneath and
inherit partial-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ..registry import query


@query(
    "sort_orderby",
    oracle="""
    SELECT
      CAST(row_number() OVER (
        ORDER BY c_acctbal DESC NULLS LAST, c_custkey
      ) AS BIGINT) AS pos,
      c_custkey,
      c_acctbal
    FROM customer
    """,
)
def sort_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort made hash-verifiable: emit the rank of every row.

    (A bare ORDER BY is invisible to an order-insensitive hash compare, so
    the sort is materialized as row_number over the same total order.)
    """
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc_nulls_last(), "c_custkey")
    return c.select(
        F.row_number().over(w).cast("long").alias("pos"),
        "c_custkey",
        "c_acctbal",
    )


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 5
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT/OFFSET with a total order (deterministic page)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(5)
        .limit(20)
    )


@query(
    "set_union",
    oracle="""
    SELECT key FROM (
      SELECT o_custkey AS key FROM orders
      UNION
      SELECT c_custkey AS key FROM customer
    )
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) via unionByName + distinct."""
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    return o.unionByName(c).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    INTERSECT
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    EXCEPT ALL
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference — preserves multiplicities)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.exceptAll(s)


@query(
    "set_union_evolved",
    oracle="""
    -- schema-drift-tolerant UNION: two event generations with different
    -- column sets unioned BY NAME, missing columns null-filled
    WITH gen1 AS (
      SELECT event_id, event_type,
             CAST(NULL AS DOUBLE) AS value, 'v1' AS gen
      FROM events WHERE event_id % 2 = 0
    ),
    gen2 AS (
      SELECT event_id, event_type, value, 'v2' AS gen
      FROM events WHERE event_id % 2 = 1
    )
    SELECT event_type, gen,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(value) AS BIGINT) AS n_with_value
    FROM (SELECT * FROM gen1 UNION ALL BY NAME SELECT * FROM gen2)
    GROUP BY event_type, gen
    """,
)
def set_union_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant union (``unionByName`` +
    ``allowMissingColumns``) — the in-flight twin of
    ``src_schema_evolution``: two pipeline generations emit different
    column sets (v1 predates ``value``), and the union must align BY NAME
    and null-fill, never by position (positional UNION silently pairs
    mismatched columns — the classic drift bug). Both generations are
    carved deterministically from the fixture (event_id parity); DuckDB's
    ``UNION ALL BY NAME`` replays the alignment. Map-only: the union is a
    plan-level concatenation, no shuffle until the audit agg.
    """
    ev = table(spark, sf_dir, "events")
    gen1 = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", F.lit("v1").alias("gen")
    )
    gen2 = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type", "value", F.lit("v2").alias("gen")
    )
    unioned = gen1.unionByName(gen2, allowMissingColumns=True)
    return unioned.groupBy("event_type", "gen").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("value").cast("long").alias("n_with_value"),
    )
