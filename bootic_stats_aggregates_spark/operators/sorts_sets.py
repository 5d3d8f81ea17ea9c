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
