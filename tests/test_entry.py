"""Smoke: the driver-facing contract surface."""

from __future__ import annotations

import bootic_stats_aggregates_spark as eng


def test_entry_smoke(spark):
    df = eng.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"event_type", "bucket_hour", "n_events"}


def test_contract_shapes():
    qs = eng.queries()
    os_ = eng.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in os_.values())
