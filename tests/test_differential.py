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


@pytest.mark.parametrize("name,sql", CASES, ids=[c[0] for c in CASES])
@given(rows=_rows)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_differential(spark, name, sql, rows):
    pdf = pd.DataFrame(rows, columns=["id", "k", "u", "v"])
    pdf["v"] = pdf["v"].round(2).astype("float64")
    sdf = spark.createDataFrame(
        [tuple(r) for r in pdf.itertuples(index=False)],
        "id long, k string, u long, v double",
    )
    sdf.createOrReplaceTempView("t")
    spark_out = spark.sql(sql).toPandas()

    con = duckdb.connect()
    con.register("t", pdf)
    duck_out = con.execute(sql).fetch_df()
    con.close()

    a, b = _normalize(spark_out), _normalize(duck_out)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    # unify null-likes (Spark None vs pandas nan) before the exact compare
    a = a.astype(object).where(pd.notnull(a), None)
    b = b.astype(object).where(pd.notnull(b), None)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
