"""Differential testing on RANDOM inputs (beyond the fixtures).

The oracle suite proves Spark==DuckDB on the driver's parquet fixtures; this
module proves the same operators agree on hypothesis-generated tables with
the shapes the fixtures never produce — NULL keys, empty strings, duplicate
timestamps, negative money, single-row groups. Each case builds one small
table in BOTH engines and runs the same SQL through both, exercising the
determinism rules (cents-exact sums, tie-broken windows, BIGINT counts)
under adversarial data.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import duckdb
import pytest

from conftest import _normalize

#: (name, shared ANSI SQL) — must parse and agree in BOTH engines.
CASES = [
    (
        "grouped_counts_sums",
        """
        SELECT
          k,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS cents,
          CAST(count(DISTINCT u) AS BIGINT) AS uniq
        FROM t GROUP BY k
        """,
    ),
    (
        "window_rank_tiebreak",
        """
        SELECT k, u, rk FROM (
          SELECT k, u,
                 CAST(row_number() OVER (
                   PARTITION BY k ORDER BY v DESC, u, id
                 ) AS BIGINT) AS rk
          FROM t
        ) WHERE rk <= 2
        """,
    ),
    (
        "having_filter",
        """
        SELECT u, CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY u HAVING count(*) > 1
        """,
    ),
    (
        "null_group_semantics",
        """
        SELECT
          k IS NULL AS k_null,
          CAST(count(*) AS BIGINT) AS n,
          CAST(count(k) AS BIGINT) AS n_nonnull
        FROM t GROUP BY 1
        """,
    ),
]

#: Window semantics under adversarial order: duplicate ORDER BY values (RANGE
#: frames must include all peers in both engines), NULL partition keys (one
#: shared partition), explicit lag defaults (VERDICT r2 item 8).
WINDOW_CASES = [
    (
        "range_frame_peers",
        """
        SELECT id, k,
               CAST(sum(CAST(round(v * 100) AS BIGINT)) OVER (
                 PARTITION BY k ORDER BY u
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS run_cents
        FROM t
        """,
    ),
    (
        "lag_with_default",
        """
        SELECT id,
               CAST(lag(u, 1, -999) OVER (PARTITION BY k ORDER BY id)
                    AS BIGINT) AS prev_u,
               CAST(lead(u, 2, -999) OVER (PARTITION BY k ORDER BY id)
                    AS BIGINT) AS next2_u
        FROM t
        """,
    ),
    (
        "rows_frame_moving_sum",
        """
        SELECT id,
               CAST(sum(u) OVER (
                 PARTITION BY k ORDER BY id
                 ROWS BETWEEN 1 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS mov_u
        FROM t
        """,
    ),
]

#: Join semantics under adversarial keys: NULLs never equal, duplicate keys
#: fan out m x n, outer joins null-extend, NOT IN collapses to empty when the
#: subquery yields a NULL (the three-valued-logic trap) (VERDICT r2 item 8).
JOIN_CASES = [
    (
        "inner_dup_null_keys",
        """
        SELECT t.id AS tid, s.id AS sid, t.k AS k
        FROM t JOIN s ON t.k = s.k
        """,
    ),
    (
        "full_outer_null_extend",
        """
        SELECT t.id AS tid, s.id AS sid
        FROM t FULL OUTER JOIN s ON t.k = s.k
        """,
    ),
    # NOT IN is exercised in FILTER context only: both engines drop the
    # unknown rows there (null-aware anti join), which is the trap users hit
    # — one NULL in the subquery empties the result. PROJECTING the same
    # predicate as a boolean column diverges across engines (Spark folds the
    # unknown to false, DuckDB keeps NULL), so that form is not a valid
    # differential case.
    (
        "anti_not_exists_vs_not_in",
        """
        SELECT id,
               EXISTS (SELECT 1 FROM s WHERE s.k = t.k) AS has_match
        FROM t
        WHERE t.k NOT IN (SELECT k FROM s)
        """,
    ),
    (
        "theta_range_join",
        """
        SELECT t.id AS tid, s.id AS sid
        FROM t JOIN s ON t.u BETWEEN s.u - 1 AND s.u + 1
        """,
    ),
    # NULL-safe equality: the NULL bucket must MATCH across sides (m x n over
    # the NULL rows) where the inner_dup_null_keys case drops it entirely.
    (
        "null_safe_join",
        """
        SELECT t.id AS tid, s.id AS sid
        FROM t JOIN s ON t.k IS NOT DISTINCT FROM s.k
        """,
    ),
    # LATERAL correlated top-2 per key with total-order tie-break: random
    # duplicate (k, u) pairs force the tie-break to decide membership.
    (
        "lateral_top2_per_key",
        """
        SELECT ks.k, l.id
        FROM (SELECT DISTINCT k FROM t WHERE k IS NOT NULL) ks,
        LATERAL (
          SELECT id FROM t WHERE t.k = ks.k ORDER BY u DESC, id LIMIT 2
        ) l
        """,
    ),
    # NOT IN with a guaranteed-non-NULL build list but a NULLABLE probe key
    # (sub_not_in_null): probe rows with NULL k must drop (UNKNOWN), not
    # null-extend like NOT EXISTS would.
    (
        "not_in_nullable_probe",
        """
        SELECT id FROM t
        WHERE t.k NOT IN (SELECT k FROM s WHERE k IS NOT NULL)
        """,
    ),
    # Bag-semantics set ops: INTERSECT ALL keeps min(multiplicity),
    # EXCEPT ALL subtracts multiplicities, and NULL keys MATCH NULL keys
    # in set operations (unlike join equality) — three traps at once.
    (
        "intersect_except_all_bags",
        """
        SELECT 'i' AS op, k, u FROM (
          SELECT k, u FROM t INTERSECT ALL SELECT k, u FROM s
        )
        UNION ALL
        SELECT 'e' AS op, k, u FROM (
          SELECT k, u FROM t EXCEPT ALL SELECT k, u FROM s
        )
        """,
    ),
]

#: Single-table cases for the round-3 analytics additions: argmax with a
#: shifted-comparand tie-break (random duplicate u per k), gaps-and-islands
#: over random integer id sets, and the VALUES fan-out distinct count that
#: backs the trailing-uniques shape.
R3_CASES = [
    (
        "argmax_shifted_tiebreak",
        """
        SELECT k,
               CAST(max_by(id, u * 1000000 + id) AS BIGINT) AS top_id,
               CAST(min_by(id, u * 1000000 + id) AS BIGINT) AS bottom_id
        FROM t GROUP BY k
        """,
    ),
    (
        "gaps_islands_int_runs",
        """
        SELECT k,
               CAST(min(id) AS BIGINT) AS start_id,
               CAST(max(id) AS BIGINT) AS end_id,
               CAST(count(*) AS BIGINT) AS n
        FROM (
          SELECT k, id,
                 id - row_number() OVER (PARTITION BY k ORDER BY id) AS anchor
          FROM t
        ) GROUP BY k, anchor
        """,
    ),
    (
        "fanout_distinct_buckets",
        """
        SELECT u + o AS bucket, CAST(count(DISTINCT id) AS BIGINT) AS uniq
        FROM t CROSS JOIN (VALUES (0), (1), (2)) AS g(o)
        GROUP BY 1
        """,
    ),
    # FILTER-clause aggregates (agg_filtered): predicate-guarded count /
    # distinct slots must see exactly the rows the guard admits, including
    # all-NULL and empty-guard groups.
    (
        "filter_clause_aggs",
        """
        SELECT k,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (WHERE u > 0) AS BIGINT) AS n_pos,
               CAST(count(DISTINCT u) FILTER (WHERE v > 0) AS BIGINT)
                 AS uniq_posv,
               CAST(sum(CAST(round(v * 100) AS BIGINT))
                    FILTER (WHERE u < 0) AS BIGINT) AS cents_neg
        FROM t GROUP BY k
        """,
    ),
    # UNPIVOT (agg_unpivot): both engines share the SQL:2023 clause; the
    # melt must fan every row to one output row per value column (cells
    # are non-NULL here — DuckDB drops NULL cells where Spark keeps them,
    # a real divergence the registered op documents and avoids).
    (
        "unpivot_melt",
        """
        SELECT id, kind, CAST(val AS DOUBLE) AS val
        FROM (SELECT id, CAST(u AS DOUBLE) AS u,
                     CAST(round(v, 2) AS DOUBLE) AS v FROM t)
        UNPIVOT (val FOR kind IN (u, v))
        """,
    ),
    # ROLLUP with NULL keys in the DATA: grouping(k) must disambiguate a
    # data-NULL group (g=0) from the rollup's subtotal row (g=1) — the
    # trap where both render as NULL in the key column.
    (
        "rollup_grouping_disambiguation",
        """
        SELECT k, CAST(grouping(k) AS BIGINT) AS is_subtotal,
               CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY ROLLUP (k)
        """,
    ),
]

_rows = st.lists(
    st.tuples(
        st.integers(0, 10_000),                                 # id
        st.one_of(st.none(), st.sampled_from(["a", "b", ""])),  # k (nullable)
        st.integers(-3, 3),                                     # u
        st.floats(-100, 100, allow_nan=False, width=32),        # v
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],
)


def _to_pdf(rows) -> pd.DataFrame:
    pdf = pd.DataFrame(rows, columns=["id", "k", "u", "v"])
    pdf["v"] = pdf["v"].round(2).astype("float64")
    return pdf


def _register(spark, con, view: str, pdf: pd.DataFrame) -> None:
    sdf = spark.createDataFrame(
        [tuple(r) for r in pdf.itertuples(index=False)],
        "id long, k string, u long, v double",
    )
    sdf.createOrReplaceTempView(view)
    con.register(view, pdf)


def _assert_engines_agree(spark, con, name: str, sql: str) -> None:
    spark_out = spark.sql(sql).toPandas()
    duck_out = con.execute(sql).fetch_df()
    a, b = _normalize(spark_out), _normalize(duck_out)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    # unify null-likes (Spark None vs pandas nan) before the exact compare
    a = a.astype(object).where(pd.notnull(a), None)
    b = b.astype(object).where(pd.notnull(b), None)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize(
    "name,sql",
    CASES + WINDOW_CASES + R3_CASES,
    ids=[c[0] for c in CASES + WINDOW_CASES + R3_CASES],
)
@given(rows=_rows)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_differential(spark, name, sql, rows):
    con = duckdb.connect()
    try:
        _register(spark, con, "t", _to_pdf(rows))
        _assert_engines_agree(spark, con, name, sql)
    finally:
        con.close()


@pytest.mark.parametrize("name,sql", JOIN_CASES, ids=[c[0] for c in JOIN_CASES])
@given(left=_rows, right=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_differential_joins(spark, name, sql, left, right):
    """Two independently-generated tables through the same join SQL in both
    engines: duplicate keys (m x n fan-out), NULL keys on either side, and
    the NOT IN three-valued-logic trap (VERDICT r2 item 8)."""
    con = duckdb.connect()
    try:
        _register(spark, con, "t", _to_pdf(left))
        _register(spark, con, "s", _to_pdf(right))
        _assert_engines_agree(spark, con, name, sql)
    finally:
        con.close()


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_entropy_formula_vs_duckdb(spark, rows):
    """llm_entropy's cross-engine claim, off the fixtures: Spark's
    H = log2(N) - (Σ c·log2 c)/N identity must equal DuckDB's native
    ``entropy()`` aggregate on random (group, value) tables — compared with
    a float tolerance, since the two compute paths are algebraically equal
    but round differently in the last bits."""
    con = duckdb.connect()
    try:
        _register(spark, con, "t", _to_pdf(rows))
        a = spark.sql(
            """
            SELECT k, log2(CAST(sum(c) AS DOUBLE))
                     - sum(c * log2(CAST(c AS DOUBLE))) / sum(c) AS ent
            FROM (SELECT k, u, count(*) AS c FROM t GROUP BY k, u)
            GROUP BY k
            """
        ).toPandas()
        b = con.execute("SELECT k, entropy(u) AS ent FROM t GROUP BY k").fetch_df()
        a = a.sort_values("k", na_position="last").reset_index(drop=True)
        b = b.sort_values("k", na_position="last").reset_index(drop=True)
        assert len(a) == len(b)
        assert list(a["k"].fillna("<null>")) == list(b["k"].fillna("<null>"))
        for x, y in zip(a["ent"], b["ent"]):
            assert abs(x - y) < 1e-9, (x, y)
    finally:
        con.close()


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bivariate_stats_close(spark, rows):
    """agg_corr_stats off the fixtures: corr / covar_samp / regr_slope on
    random tables agree across engines within float tolerance (exact
    equality is not promised — partials merge in different orders — which
    is exactly why the registered op rounds before hashing). Restricted to
    groups where the statistics are defined: Spark's ANSI mode raises
    DIVIDE_BY_ZERO on single-row / zero-variance groups where DuckDB
    returns NULL — a real engine difference, bounded here by the HAVING
    guard (the same guard a production query needs under ANSI)."""
    con = duckdb.connect()
    try:
        _register(spark, con, "t", _to_pdf(rows))
        # the guard must be a PRE-filter (WHERE k IN ...): HAVING would run
        # after Spark has already evaluated corr on the degenerate group
        sql = """
            SELECT k,
                   corr(v, u) AS c,
                   covar_samp(v, u) AS cv,
                   regr_slope(v, u) AS sl
            FROM t
            WHERE k IN (SELECT k FROM t GROUP BY k
                        HAVING count(*) >= 2
                           AND stddev_samp(u) > 0 AND stddev_samp(v) > 0)
            GROUP BY k
        """
        a = spark.sql(sql).toPandas().sort_values("k", na_position="last")
        b = con.execute(sql).fetch_df().sort_values("k", na_position="last")
        assert len(a) == len(b)
        for col in ("c", "cv", "sl"):
            for x, y in zip(a[col], b[col]):
                if pd.isnull(x) or pd.isnull(y):
                    # single-point / zero-variance groups: both engines
                    # must agree the statistic is undefined
                    assert pd.isnull(x) and pd.isnull(y), (col, x, y)
                else:
                    tol = 1e-6 * max(abs(x), abs(y), 1.0)
                    assert abs(x - y) <= tol, (col, x, y)
    finally:
        con.close()


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_vs_duckdb_native(spark, rows):
    """join_asof's union + last(ignorenulls) carry-forward against
    DuckDB's NATIVE ASOF LEFT JOIN on random tables — the differential
    the fixture can't give: duplicate timestamps (ties must resolve to
    the <= match), users with no prior 'view', and interleaved orders.
    Rows with even id play views, odd id play clicks; the carried value
    is the view timestamp itself, so tie choice cannot diverge. NULL
    keys are excluded: DuckDB's ASOF implementation does not honor
    null-safe equality on the match prefix (found by this test), and the
    registered join_asof keys on non-null user_id."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    con = duckdb.connect()
    try:
        pdf = _to_pdf(rows)
        _register(spark, con, "t", pdf)
        duck = con.execute(
            """
            SELECT c.id AS click_id,
                   c.k AS user_k,
                   v.u AS asof_u
            FROM (SELECT * FROM t WHERE id % 2 = 1 AND k IS NOT NULL) c
            ASOF LEFT JOIN
                 (SELECT * FROM t WHERE id % 2 = 0 AND k IS NOT NULL) v
              ON c.k = v.k AND v.u <= c.u
            """
        ).fetch_df()
        sdf = spark.table("t").filter(F.col("k").isNotNull())
        views = sdf.filter(F.col("id") % 2 == 0).select(
            "k", "u", "id", F.lit(0).alias("kind"), F.col("u").alias("view_u")
        )
        clicks = sdf.filter(F.col("id") % 2 == 1).select(
            "k", "u", "id", F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("view_u"),
        )
        w = (
            Window.partitionBy("k")
            .orderBy("u", "kind", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = views.unionByName(clicks).withColumn(
            "asof_u", F.last("view_u", ignorenulls=True).over(w)
        )
        got = (
            merged.filter(F.col("kind") == 1)
            .select(F.col("id").alias("click_id"), F.col("k").alias("user_k"),
                    "asof_u")
            .toPandas()
        )
        a = got.sort_values(["click_id"]).reset_index(drop=True)
        b = duck.sort_values(["click_id"]).reset_index(drop=True)
        assert len(a) == len(b)
        for col in ("click_id", "user_k", "asof_u"):
            av = [None if pd.isnull(x) else x for x in a[col]]
            bv = [None if pd.isnull(x) else x for x in b[col]]
            assert av == bv, (col, av, bv)
    finally:
        con.close()


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_forward_vs_duckdb_native(spark, rows):
    """join_asof_forward's time-mirrored carry (DESC scan, views before
    clicks at equal keys) against DuckDB's native ASOF with ``>=`` — the
    r3 tie/null frontier (VERDICT r3 item 7): equal timestamps must admit
    the simultaneous view on both engines, users whose every view is
    strictly earlier must yield NULL, and duplicate view timestamps must
    not diverge (the carried value is the view timestamp itself)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    con = duckdb.connect()
    try:
        pdf = _to_pdf(rows)
        _register(spark, con, "t", pdf)
        duck = con.execute(
            """
            SELECT c.id AS click_id, c.k AS user_k, v.u AS next_u
            FROM (SELECT * FROM t WHERE id % 2 = 1 AND k IS NOT NULL) c
            ASOF LEFT JOIN
                 (SELECT * FROM t WHERE id % 2 = 0 AND k IS NOT NULL) v
              ON c.k = v.k AND v.u >= c.u
            """
        ).fetch_df()
        sdf = spark.table("t").filter(F.col("k").isNotNull())
        views = sdf.filter(F.col("id") % 2 == 0).select(
            "k", "u", "id", F.lit(0).alias("kind"), F.col("u").alias("view_u")
        )
        clicks = sdf.filter(F.col("id") % 2 == 1).select(
            "k", "u", "id", F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("view_u"),
        )
        w = (
            Window.partitionBy("k")
            .orderBy(F.col("u").desc(), F.col("kind").asc(), F.col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = views.unionByName(clicks).withColumn(
            "next_u", F.last("view_u", ignorenulls=True).over(w)
        )
        got = (
            merged.filter(F.col("kind") == 1)
            .select(F.col("id").alias("click_id"), F.col("k").alias("user_k"),
                    "next_u")
            .toPandas()
        )
        a = got.sort_values(["click_id"]).reset_index(drop=True)
        b = duck.sort_values(["click_id"]).reset_index(drop=True)
        assert len(a) == len(b)
        for col in ("click_id", "user_k", "next_u"):
            av = [None if pd.isnull(x) else x for x in a[col]]
            bv = [None if pd.isnull(x) else x for x in b[col]]
            assert av == bv, (col, av, bv)
    finally:
        con.close()


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_tolerance_vs_duckdb_native(spark, rows):
    """join_asof_tolerance's staleness gate on random tables: the backward
    carry plus an age<=TOL post-filter must agree with DuckDB's native
    ASOF + the same CASE — including the exact-boundary age (u spans only
    [-3,3] so TOL=2 forces matches AT the threshold), never-matched keys
    (dropped_stale must be FALSE, not NULL), and equal timestamps
    (age 0)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    TOL = 2
    con = duckdb.connect()
    try:
        pdf = _to_pdf(rows)
        _register(spark, con, "t", pdf)
        duck = con.execute(
            f"""
            WITH raw AS (
              SELECT c.id AS click_id, v.u AS matched_u,
                     c.u - v.u AS age
              FROM (SELECT * FROM t WHERE id % 2 = 1 AND k IS NOT NULL) c
              ASOF LEFT JOIN
                   (SELECT * FROM t WHERE id % 2 = 0 AND k IS NOT NULL) v
                ON c.k = v.k AND v.u <= c.u
            )
            SELECT click_id,
                   CASE WHEN age <= {TOL} THEN matched_u END AS fresh_u,
                   coalesce(age > {TOL}, FALSE) AS dropped_stale
            FROM raw
            """
        ).fetch_df()
        sdf = spark.table("t").filter(F.col("k").isNotNull())
        views = sdf.filter(F.col("id") % 2 == 0).select(
            "k", "u", "id", F.lit(0).alias("kind"), F.col("u").alias("view_u")
        )
        clicks = sdf.filter(F.col("id") % 2 == 1).select(
            "k", "u", "id", F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("view_u"),
        )
        w = (
            Window.partitionBy("k")
            .orderBy("u", "kind", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = views.unionByName(clicks).withColumn(
            "asof_u", F.last("view_u", ignorenulls=True).over(w)
        )
        age = F.col("u") - F.col("asof_u")
        got = (
            merged.filter(F.col("kind") == 1)
            .select(
                F.col("id").alias("click_id"),
                F.when(age <= TOL, F.col("asof_u")).alias("fresh_u"),
                (F.col("asof_u").isNotNull() & (age > TOL)).alias(
                    "dropped_stale"
                ),
            )
            .toPandas()
        )
        a = got.sort_values(["click_id"]).reset_index(drop=True)
        b = duck.sort_values(["click_id"]).reset_index(drop=True)
        assert len(a) == len(b)
        for col in ("click_id", "fresh_u", "dropped_stale"):
            av = [None if pd.isnull(x) else x for x in a[col]]
            bv = [None if pd.isnull(x) else x for x in b[col]]
            assert av == bv, (col, av, bv)
    finally:
        con.close()


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ntile_boundary_ties(spark, rows):
    """win_decile_report's ntile under adversarial cardinalities: group
    sizes not divisible by the tile count (the first ``n % tiles`` tiles
    get the extra row — both engines must split identically) and heavy
    ORDER BY ties (u spans only [-3,3]); the id tie-break makes the
    order total, which is exactly the determinism rule the registered op
    follows."""
    con = duckdb.connect()
    try:
        _register(spark, con, "t", _to_pdf(rows))
        sql = """
            SELECT id,
                   CAST(ntile(4) OVER (ORDER BY u, id) AS BIGINT) AS quartile,
                   CAST(ntile(10) OVER (PARTITION BY k ORDER BY v DESC, id)
                        AS BIGINT) AS decile_in_k
            FROM t
        """
        _assert_engines_agree(spark, con, "ntile_boundary_ties", sql)
    finally:
        con.close()


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_max_by_extreme_comparands(spark, rows):
    """agg_argmax's max_by/min_by at the comparand's 64-bit bounds
    (VERDICT r3 item 7): comparands pinned to I64_MAX-id / I64_MIN+id
    (exact integer arithmetic, no overflow en route) must pick the same
    argument in both engines, with NULL-comparand rows ignored by both.
    The comparand is unique per row by construction — max_by under ties
    is explicitly nondeterministic in both engines, so ties are the one
    shape a differential must NOT generate."""
    con = duckdb.connect()
    try:
        _register(spark, con, "t", _to_pdf(rows))
        sql = """
            SELECT k,
                   CAST(max_by(id, big) AS BIGINT) AS arg_hi,
                   CAST(min_by(id, big) AS BIGINT) AS arg_lo,
                   CAST(max(big) AS BIGINT) AS hi,
                   CAST(count(big) AS BIGINT) AS n_cmp
            FROM (
              SELECT k, id,
                     CASE WHEN u > 0 THEN 9223372036854775807 - id
                          WHEN u < 0 THEN -9223372036854775807 + id
                          ELSE NULL END AS big
              FROM t
            )
            GROUP BY k
        """
        _assert_engines_agree(spark, con, "max_by_extreme_comparands", sql)
    finally:
        con.close()


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_overlap_bucketing_vs_bruteforce(spark, rows):
    """join_interval_overlap's dedup-free bucket trick on random data:
    explode-to-spanned-buckets + emit-only-in-greatest(starts)-bucket
    must reproduce DuckDB's brute-force inequality join EXACTLY —
    including touching endpoints (closed intervals), duplicate
    timestamps, negative coordinates (floor-division direction), and
    intervals spanning 1..3 buckets. Evens open [u, u+2], odds [u, u+1],
    bucket width 2, keyed by k."""
    import pyspark.sql.functions as F

    con = duckdb.connect()
    try:
        pdf = _to_pdf(rows)
        _register(spark, con, "iv", pdf)
        duck = con.execute(
            """
            SELECT a.id AS a_id, b.id AS b_id,
                   CAST(least(a.u + 2, b.u + 1) - greatest(a.u, b.u)
                        AS BIGINT) AS ov
            FROM (SELECT * FROM iv WHERE id % 2 = 0) a
            JOIN (SELECT * FROM iv WHERE id % 2 = 1) b
              ON a.k = b.k AND a.u <= b.u + 1 AND b.u <= a.u + 2
            """
        ).fetch_df()
        W = 2
        t = spark.table("iv")

        def side(parity: int, length: int, ida: str, ua: str):
            return t.filter(t.id % 2 == parity).select(
                F.col("id").alias(ida),
                "k",
                F.col("u").alias(ua),
                F.explode(
                    F.sequence(
                        F.floor(F.col("u") / W).cast("long"),
                        F.floor((F.col("u") + length) / W).cast("long"),
                    )
                ).alias("bk"),
            )

        a = side(0, 2, "a_id", "a_u")
        b = side(1, 1, "b_id", "b_u")
        g = F.greatest(F.col("a_u"), F.col("b_u"))
        got = (
            a.join(b, ["k", "bk"])
            .filter(
                (F.col("a_u") <= F.col("b_u") + 1)
                & (F.col("b_u") <= F.col("a_u") + 2)
                & (F.floor(g / W).cast("long") == F.col("bk"))
            )
            .select(
                "a_id",
                "b_id",
                (
                    F.least(F.col("a_u") + 2, F.col("b_u") + 1) - g
                ).cast("long").alias("ov"),
            )
            .toPandas()
        )
        av = sorted(map(tuple, got.itertuples(index=False)))
        bv = sorted(map(tuple, duck.itertuples(index=False)))
        assert av == bv, (av, bv)
    finally:
        con.close()


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_date_arith_vs_duckdb(spark, rows):
    """fn_date_arith's calendar semantics on ADVERSARIAL dates: map each
    random id to a date around month ends and leap boundaries
    (2024-02-29 territory), then compare Spark's add_months / last_day /
    next_day / weekofyear against DuckDB's interval math and isodow
    replay — the clamp rules and the strictly-after next-weekday rule
    must agree on every generated date."""
    import pyspark.sql.functions as F

    con = duckdb.connect()
    try:
        pdf = _to_pdf(rows)
        # derive a date per row: spread ids across ~6 years including two
        # leap years, biased toward month boundaries via the u column
        _register(spark, con, "dt", pdf)
        duck = con.execute(
            """
            WITH d AS (
              SELECT id,
                     DATE '2022-01-28' + CAST(id % 2200 AS INT)
                       + CAST(u AS INT) AS dd
              FROM dt
            )
            SELECT id,
                   CAST(dd + INTERVAL 1 MONTH AS DATE)::VARCHAR AS m1,
                   CAST(dd + INTERVAL 13 MONTH AS DATE)::VARCHAR AS m13,
                   CAST(last_day(dd) AS VARCHAR) AS eom,
                   CAST(dd + CAST(CASE WHEN (12 - isodow(dd)) % 7 = 0 THEN 7
                               ELSE (12 - isodow(dd)) % 7 END AS INT)
                        AS VARCHAR) AS next_fri,
                   CAST(weekofyear(dd) AS BIGINT) AS iso_week
            FROM d
            """
        ).fetch_df()
        sdf = spark.table("dt")
        dd = F.date_add(
            F.lit("2022-01-28").cast("date"),
            (F.col("id") % 2200 + F.col("u")).cast("int"),
        )
        got = sdf.select(
            "id",
            F.add_months(dd, 1).cast("string").alias("m1"),
            F.add_months(dd, 13).cast("string").alias("m13"),
            F.last_day(dd).cast("string").alias("eom"),
            F.next_day(dd, "FRI").cast("string").alias("next_fri"),
            F.weekofyear(dd).cast("long").alias("iso_week"),
        ).toPandas()
        a = got.sort_values("id").reset_index(drop=True)
        b = duck.sort_values("id").reset_index(drop=True)
        assert len(a) == len(b)
        for col in ("m1", "m13", "eom", "next_fri", "iso_week"):
            av = list(a[col])
            bv = list(b[col])
            assert av == bv, (col, av, bv)
    finally:
        con.close()


def test_aes_vs_cryptography_reference():
    """Cross-LIBRARY check for the at-rest crypto family (VERDICT r4 item
    6): Spark's aes_encrypt must agree BYTE-FOR-BYTE with the
    ``cryptography`` package — ECB+PKCS7 for fn_aes_roundtrip's mode, and
    IV || AESGCM(ciphertext || tag) framing for fn_aes_gcm's — on
    boundary plaintexts (empty, 15/16/17 bytes around the block edge,
    multi-byte UTF-8). Self-roundtrip can't catch a cipher that is
    internally consistent but wrong; an independent implementation can."""
    cryptography = pytest.importorskip("cryptography")  # noqa: F841
    from cryptography.hazmat.primitives import padding as cpad
    from cryptography.hazmat.primitives.ciphers import (
        Cipher,
        algorithms,
        modes,
    )
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from bootic_stats_aggregates_spark.functions.families import (
        _AES_GCM_TEST_IV_HEX,
        _aes_test_key,
    )

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    key = _aes_test_key()
    plaintexts = [
        "",
        "x",
        "fifteen_bytes__",
        "sixteen_bytes___",
        "seventeen_bytes__",
        "ünïcode ✓ multibyte",
        "a" * 64,
    ]
    df = spark.createDataFrame([(p,) for p in plaintexts], "p string")
    got = df.select(
        "p",
        F.aes_encrypt("p", F.lit(key), F.lit("ECB")).alias("ecb"),
        F.aes_encrypt(
            "p",
            F.lit(key),
            F.lit("GCM"),
            F.lit("DEFAULT"),
            F.to_binary(F.lit(_AES_GCM_TEST_IV_HEX), F.lit("hex")),
        ).alias("gcm"),
    ).collect()
    kb = key.encode()
    iv = bytes.fromhex(_AES_GCM_TEST_IV_HEX)
    for r in got:
        pb = r.p.encode()
        padder = cpad.PKCS7(128).padder()
        padded = padder.update(pb) + padder.finalize()
        enc = Cipher(algorithms.AES(kb), modes.ECB()).encryptor()
        ref_ecb = enc.update(padded) + enc.finalize()
        assert bytes(r.ecb) == ref_ecb, f"ECB mismatch for {r.p!r}"
        ref_gcm = iv + AESGCM(kb).encrypt(iv, pb, None)
        assert bytes(r.gcm) == ref_gcm, f"GCM mismatch for {r.p!r}"


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_nearest_equidistant_ties(spark, rows):
    """join_asof_nearest's documented tie rule — equidistant back/forward
    candidates resolve to the EARLIER (backward) view — checked off the
    fixtures against a DuckDB replay built from two native ASOF joins +
    the same CASE. The coarse u grid (-3..3) makes exact equidistance
    common; evens play views, odds play clicks, NULL keys excluded (same
    carve-out as test_asof_join_vs_duckdb_native)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    con = duckdb.connect()
    try:
        pdf = _to_pdf(rows)
        _register(spark, con, "t", pdf)
        duck = con.execute(
            """
            WITH c AS (SELECT * FROM t WHERE id % 2 = 1 AND k IS NOT NULL),
            v AS (SELECT * FROM t WHERE id % 2 = 0 AND k IS NOT NULL),
            b AS (
              SELECT c.id AS cid, v.u AS bu
              FROM c ASOF LEFT JOIN v ON c.k = v.k AND v.u <= c.u
            ),
            f AS (
              SELECT c.id AS cid, v.u AS fu
              FROM c ASOF LEFT JOIN v ON c.k = v.k AND v.u >= c.u
            )
            SELECT c.id AS click_id,
                   CASE WHEN bu IS NULL THEN fu
                        WHEN fu IS NULL THEN bu
                        WHEN c.u - bu <= fu - c.u THEN bu ELSE fu
                   END AS nearest_u
            FROM c
            JOIN b ON c.id = b.cid
            JOIN f ON c.id = f.cid
            """
        ).fetch_df()
        sdf = spark.table("t").filter(F.col("k").isNotNull())
        views = sdf.filter(F.col("id") % 2 == 0).select(
            "k", "u", "id", F.lit(0).alias("kind"), F.col("u").alias("view_u")
        )
        clicks = sdf.filter(F.col("id") % 2 == 1).select(
            "k", "u", "id", F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("view_u"),
        )
        asc = (
            Window.partitionBy("k")
            .orderBy("u", "kind", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        desc = (
            Window.partitionBy("k")
            .orderBy(F.col("u").desc(), F.col("kind").asc(), F.col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = (
            views.unionByName(clicks)
            .withColumn("back_u", F.last("view_u", ignorenulls=True).over(asc))
            .withColumn("fwd_u", F.last("view_u", ignorenulls=True).over(desc))
        )
        back_age = F.col("u") - F.col("back_u")
        fwd_age = F.col("fwd_u") - F.col("u")
        nearest = (
            F.when(F.col("back_u").isNull(), F.col("fwd_u"))
            .when(F.col("fwd_u").isNull(), F.col("back_u"))
            .when(back_age <= fwd_age, F.col("back_u"))
            .otherwise(F.col("fwd_u"))
        )
        got = (
            merged.filter(F.col("kind") == 1)
            .select(F.col("id").alias("click_id"), nearest.alias("nearest_u"))
            .toPandas()
        )
        a = got.sort_values("click_id").reset_index(drop=True)
        b = duck.sort_values("click_id").reset_index(drop=True)
        assert len(a) == len(b)
        for col in ("click_id", "nearest_u"):
            av = [None if pd.isnull(x) else x for x in a[col]]
            bv = [None if pd.isnull(x) else x for x in b[col]]
            assert av == bv, (col, av, bv)
    finally:
        con.close()


def test_interval_overlap_touching_boundaries(spark):
    """Pinned end==start cases for join_interval_overlap's CLOSED-interval
    contract (VERDICT r4 item 6): a pair whose intervals merely TOUCH
    (overlap_sec == 0) is emitted exactly once, and a pair one unit
    apart is not. Interval A = [u, u+2] (even ids), B = [u, u+1] (odd
    ids), bucket width 2 — the same shape as the hypothesis test but
    with the boundary geometry fixed, not sampled."""
    import pyspark.sql.functions as F

    # (id, k, u): A0 [0,2]; B touch-right at 2 -> [2,3] ov 0 (kept);
    # B touch-left with b.u+1 == a.u -> [-1,0] ov 0 (kept);
    # B just outside right [3,4] and left [-2,-1] (dropped);
    # B fully inside [1,2] ov 1 (kept, emitted once though it spans
    # the same buckets as A twice).
    rows = [
        (0, "a", 0),
        (1, "a", 2),
        (3, "a", -1),
        (5, "a", 3),
        (7, "a", -2),
        (9, "a", 1),
    ]
    t = spark.createDataFrame(rows, "id long, k string, u long")
    W = 2

    def side(parity: int, length: int, ida: str, ua: str):
        return t.filter(t.id % 2 == parity).select(
            F.col("id").alias(ida),
            "k",
            F.col("u").alias(ua),
            F.explode(
                F.sequence(
                    F.floor(F.col("u") / W).cast("long"),
                    F.floor((F.col("u") + length) / W).cast("long"),
                )
            ).alias("bk"),
        )

    a = side(0, 2, "a_id", "a_u")
    b = side(1, 1, "b_id", "b_u")
    g = F.greatest(F.col("a_u"), F.col("b_u"))
    got = sorted(
        (r.a_id, r.b_id, r.ov)
        for r in (
            a.join(b, ["k", "bk"])
            .filter(
                (F.col("a_u") <= F.col("b_u") + 1)
                & (F.col("b_u") <= F.col("a_u") + 2)
                & (F.floor(g / W).cast("long") == F.col("bk"))
            )
            .select(
                "a_id",
                "b_id",
                (F.least(F.col("a_u") + 2, F.col("b_u") + 1) - g)
                .cast("long")
                .alias("ov"),
            )
            .collect()
        )
    )
    assert got == [(0, 1, 0), (0, 3, 0), (0, 9, 1)], got


@given(rows=_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_nth_value_short_frames(spark, rows):
    """win_nth_value's frontier (VERDICT r4 item 6): frames SHORTER than
    n must yield NULL identically in both engines, and IGNORE NULLS
    first/last must skip data NULLs the same way. The generator's tiny
    groups (1..40 rows over 4 keys, nullable v) produce sub-3-row
    frames and all-NULL partitions constantly. Same semantics per
    engine; the SQL differs only in IGNORE NULLS placement (Spark:
    after the call parens; DuckDB: inside them — a grammar difference,
    found by this test's first run)."""

    def sql(ignore_nulls_inside: bool) -> str:
        fv = (
            "first_value(CASE WHEN id % 3 <> 0 THEN u END IGNORE NULLS)"
            if ignore_nulls_inside
            else "first_value(CASE WHEN id % 3 <> 0 THEN u END) IGNORE NULLS"
        )
        lv = (
            "last_value(CASE WHEN id % 3 <> 0 THEN u END IGNORE NULLS)"
            if ignore_nulls_inside
            else "last_value(CASE WHEN id % 3 <> 0 THEN u END) IGNORE NULLS"
        )
        return f"""
            SELECT id, k,
                   nth_value(u, 3) OVER (
                     PARTITION BY k ORDER BY u, id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS third_u,
                   {fv} OVER (
                       PARTITION BY k ORDER BY u, id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING
                     ) AS first_nn,
                   {lv} OVER (
                       PARTITION BY k ORDER BY u, id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING
                     ) AS last_nn
            FROM t
        """

    con = duckdb.connect()
    try:
        _register(spark, con, "t", _to_pdf(rows))
        a = _normalize(spark.sql(sql(False)).toPandas())
        b = _normalize(con.execute(sql(True)).fetch_df())
        assert a.shape == b.shape, (a.shape, b.shape)
        a = a.astype(object).where(pd.notnull(a), None)
        b = b.astype(object).where(pd.notnull(b), None)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
    finally:
        con.close()
