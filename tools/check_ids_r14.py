#!/usr/bin/env python
"""Oracle-check a comma-separated id list in a fresh hostile-TZ process —
the driver_sim compare loop, filtered by qid instead of slice index.

Usage: python tools/check_ids_r14.py <qid,qid,...> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from driver_sim import TABLES, _norm  # noqa: E402


def main() -> None:
    ids = sys.argv[1].split(",")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    tz = os.environ.get("SPARK_GRAFT_SIM_TZ", "America/New_York")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-ids-r14")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", tz)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import importlib.util

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(here, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    n_ok = n_bad = 0
    for qid in ids:
        try:
            a = _norm(qs[qid](spark, sf).toPandas())
            b = _norm(con.execute(osql[qid]).fetch_df())
            ok = bool(a.shape == b.shape and a.equals(b))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"q": qid, "ok": False, "err": str(e)[:300]}))
            n_bad += 1
            continue
        print(json.dumps({"q": qid, "ok": ok, "rows": int(a.shape[0])}))
        n_ok += ok
        n_bad += not ok
    print(json.dumps({"sf": sf, "ok": n_ok, "bad": n_bad}))


if __name__ == "__main__":
    main()
