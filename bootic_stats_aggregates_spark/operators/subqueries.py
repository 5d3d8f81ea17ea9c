"""Subqueries & quantiles — EP2 (SQL-string) lifecycle coverage.

``spark.sql`` strings go through the same Catalyst pipeline as the
DataFrame API (SURVEY.md §3.2 EP2); the correlated-subquery query below
exists specifically to exercise Catalyst's subquery decorrelation
(``RewriteCorrelatedScalarSubquery``, SURVEY.md §4.2) rather than
hand-decorrelating with a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query

#: Exact per-nation average balance (cents-based — identical on both
#: engines; a plain avg(double) is accumulation-order-dependent).
_NATION_AVG = (
    "SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS DOUBLE)"
    " / 100.0 / count(*) FROM customer c2"
    " WHERE c2.c_nationkey = customer.c_nationkey"
)


@query(
    "sub_scalar_corr",
    oracle=f"""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer
    WHERE c_acctbal > ({_NATION_AVG})
    """,
)
def sub_scalar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's average.

    Written as SQL so Catalyst performs the decorrelation (rewrites to an
    aggregate + join); the DataFrame API twin would be the manual join.
    """
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        f"""
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer
        WHERE c_acctbal > ({_NATION_AVG})
        """
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT
      event_type,
      round(quantile_cont(value, 0.5), 4) AS p50,
      round(quantile_cont(value, 0.9), 4) AS p90,
      round(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (latency-style analytics).

    Spark ``percentile`` and DuckDB ``quantile_cont`` share the linear
    interpolation definition. The streaming/100 TB variant is
    ``approx_percentile`` (t-digest-style sketch, mergeable) — exact
    percentiles need the full group sorted.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "sub_exists_in",
    oracle="""
    SELECT
      c_custkey,
      EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = customer.c_custkey
                AND o.o_totalprice > 100000) AS has_big_order,
      c_custkey IN (SELECT o_custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT') AS has_urgent
    FROM customer
    """,
)
def sub_exists_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + uncorrelated IN as PROJECTED booleans (not mere
    semi/anti filters — join_semi/join_anti cover those): Catalyst rewrites
    both into existence joins (RewritePredicateSubquery), which at 100 TB
    is one shuffle per subquery on the correlation key instead of a
    per-row probe. Exercised via spark.sql so the SQL front end's subquery
    planning — the part a DataFrame translation would skip — is the thing
    under test.
    """
    for t in ("customer", "orders"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT
          c_custkey,
          EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = customer.c_custkey
                    AND o.o_totalprice > 100000) AS has_big_order,
          c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT') AS has_urgent
        FROM customer
        """
    )


@query(
    "sub_lateral_topn",
    oracle="""
    -- LATERAL correlated top-N: the two richest customers of EVERY nation
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) t
    """,
)
def sub_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with per-group ORDER BY + LIMIT — the
    "top N per outer row" idiom written the way an analyst writes it.

    Catalyst DECORRELATES this (DecorrelateInnerQuery): the per-nation
    LIMIT becomes a group-limit under one equi-join — no per-outer-row
    re-execution, no nested loop (verified: the plan is a broadcast hash
    join over a pre-limited customer side). Same result as the
    ``row_number() <= k`` formulation (``rank_topk_per_group``), but this
    surface exercises the SQL lifecycle path and the decorrelation rule.
    ORDER BY carries c_custkey as total-order tie-break (FIXTURES rule 2).
    """
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) t
        """
    )


@query(
    "sub_not_in_null",
    oracle="""
    -- NOT IN under three-valued logic: a NULL probe key is NEITHER in nor
    -- not-in the list, so the NULL bucket must vanish from the result —
    -- the classic NOT IN trap done right on both engines.
    WITH keyed AS (
      SELECT nullif(CAST(json_extract(props, '$.k') AS BIGINT) % 10, 7)
               AS k10,
             user_id
      FROM events
    )
    SELECT k10, CAST(count(*) AS BIGINT) AS n_events
    FROM keyed
    WHERE k10 NOT IN (SELECT DISTINCT k10 FROM keyed
                      WHERE k10 IS NOT NULL AND k10 < 3)
    GROUP BY k10
    """,
)
def sub_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULLABLE probe key — the anti-join variant
    ``join_anti`` (NOT EXISTS) does NOT cover: under three-valued logic
    ``NULL NOT IN (...)`` is UNKNOWN, so rows with a NULL key are dropped,
    whereas NOT EXISTS would keep them. Catalyst plans this as a
    null-aware anti join (the build side's static type stays nullable
    through ``nullif``), which Spark executes broadcast-only — exactly
    right at 100 TB where the excluded-key list is small and the probe
    side is the fact stream. The NULL bucket is synthesized
    deterministically (payload ``k % 10 = 7 -> NULL``, same family as
    ``join_null_safe``) so both engines face identical data.
    """
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH keyed AS (
          SELECT nullif(CAST(get_json_object(props, '$.k') AS BIGINT) % 10, 7)
                   AS k10,
                 user_id
          FROM events
        )
        SELECT k10, CAST(count(*) AS BIGINT) AS n_events
        FROM keyed
        WHERE k10 NOT IN (SELECT DISTINCT k10 FROM keyed
                          WHERE k10 IS NOT NULL AND k10 < 3)
        GROUP BY k10
        """
    )
