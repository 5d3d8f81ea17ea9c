"""Operator-per-query oracle tests (SURVEY.md §5.2 item 1).

Parametrized over every registered query that declares a DuckDB oracle —
the local mirror of the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import pytest

from bootic_stats_aggregates_spark.registry import all_oracles, all_queries

from conftest import SF_DIR, assert_oracle_match

ORACLES = all_oracles()
QUERIES = all_queries()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_oracle(qid, spark, duck):
    spark_pdf = QUERIES[qid](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(ORACLES[qid]).fetch_df()
    assert_oracle_match(spark_pdf, duck_pdf, qid)


@pytest.mark.parametrize("qid", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(qid, spark):
    """Queries without an oracle still must run and return a stable schema."""
    df = QUERIES[qid](spark, SF_DIR)
    assert df.columns, f"{qid}: no columns"
    assert df.count() >= 0
