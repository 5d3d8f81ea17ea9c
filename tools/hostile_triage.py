#!/usr/bin/env python
"""Show the Spark-vs-DuckDB row diff for registered queries on a fixture
dir (default the hostile dir) — the triage companion of driver_sim.py.

Usage: python tools/hostile_triage.py <query_id> [...]
Env:   SPARK_GRAFT_SIM_SF_DIR (default /tmp/hostile_sf)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/tmp/hostile_sf")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif s.dtype == object:
            pdf[c] = s.map(lambda v: None if v is None else str(v))
    return pdf.sort_values(
        list(pdf.columns), na_position="last"
    ).reset_index(drop=True)


def main() -> None:
    from bootic_stats_aggregates_spark.registry import all_oracles, all_queries
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("hostile-triage")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # Single-threaded oracle: DuckDB v1.0.0's PARALLEL window operator is
    # nondeterministic when a window partition/order key is NULL (hostile
    # fixture, r7: NULL-key partitions randomly merge into neighbors,
    # 20/30 runs) — threads=1 removes the parallel path. The product-side
    # fix is still real (null-safe joins/sentinels in the queries); this
    # only keeps the VERIFIER deterministic.
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs, osql = all_queries(), all_oracles()
    for qid in sys.argv[1:]:
        print(f"=== {qid} ===")
        try:
            a = _norm(qs[qid](spark, SF).toPandas())
            b = _norm(con.execute(osql[qid]).fetch_df())
        except Exception as exc:  # noqa: BLE001 - triage tool
            print("ERROR:", str(exc)[:500])
            continue
        if a.shape == b.shape and a.equals(b):
            print("match", a.shape)
            continue
        print("spark", a.shape, "oracle", b.shape)
        merged = a.merge(b, how="outer", indicator=True)
        only_a = merged[merged["_merge"] == "left_only"]
        only_b = merged[merged["_merge"] == "right_only"]
        print("-- spark-only rows --")
        print(only_a.head(15).to_string())
        print("-- oracle-only rows --")
        print(only_b.head(15).to_string())


if __name__ == "__main__":
    main()
