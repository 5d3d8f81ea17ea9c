"""Projection & filtering (SURVEY.md §2.2).

The reference's only "query logic" is a type dispatch on each decoded event
(``switch evt.Type`` — SURVEY.md §3.1 EP1/EP2). Here that is a declarative
``filter`` the planner pushes into the parquet scan (PushedFilters), plus the
richer predicate surface a real engine needs (BETWEEN/IN/LIKE/NULL-safe).

Scale: every filter in this module is expressible as a data-source filter or
a codegen'd predicate — nothing falls back to Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query


@query(
    "proj_select",
    oracle="""
    SELECT
      o_orderkey,
      o_custkey,
      upper(o_orderstatus) AS status_u,
      o_totalprice * 0.05 AS fee,
      date_trunc('day', o_orderdate) AS order_day
    FROM orders
    """,
)
def proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with renames + computed columns (row-local, codegen'd).

    Row-local double arithmetic (``* 0.05``) is a single IEEE op on identical
    inputs — bit-exact across engines, so no rounding needed.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.upper("o_orderstatus").alias("status_u"),
        (F.col("o_totalprice") * F.lit(0.05)).alias("fee"),
        F.date_trunc("day", "o_orderdate").alias("order_day"),
    )


@query(
    "filt_event_type",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def filt_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dispatch-on-type, as a pushed-down scan predicate."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )


@query(
    "filt_predicate",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_totalprice BETWEEN 20000 AND 120000
      AND o_orderstatus IN ('F', 'O')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_custkey IS NOT NULL
    """,
)
def filt_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates: BETWEEN / IN / LIKE / IS NOT NULL."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(20000, 120000)
        & F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "filt_json_pred",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
    """,
)
def filt_json_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate over a nested JSON field (schema-on-read filtering)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.filter(k > 50).select(
        "event_id", "event_type", k.alias("k")
    )


#: Large literal IN-list: deterministic subset of user ids (every 7th of
#: the first 3500 — 500 entries, above Spark's OptimizeIn threshold).
IN_LIST = tuple(range(0, 3500, 7))


@query(
    "filt_in_large_list",
    oracle=f"""
    -- 500-element IN list: the engine must evaluate it as a SET probe,
    -- not 500 chained equality ORs
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS uniq
    FROM events
    WHERE user_id IN ({", ".join(str(x) for x in IN_LIST)})
    GROUP BY event_type
    """,
)
def filt_in_large_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large literal IN-list (500 entries) — the filter shape BI tools
    and id-allowlists generate constantly. Catalyst's OptimizeIn rewrite
    converts it to an InSet hash probe (O(1) per row) instead of 500
    chained OR comparisons (O(n) per row and a codegen blowup); above
    ~spark.sql.optimizer.inSetConversionThreshold this is automatic.
    The membership math itself is oracle-checked; the plan shape keeps
    the predicate scannable at 100 TB.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id").isin(*IN_LIST))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("uniq"),
        )
    )
