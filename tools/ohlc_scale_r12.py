#!/usr/bin/env python
"""100x probe for win_ohlc_bars (late r12): the OHLC downsampling
operator against the 10M-row replicated events corpus staged by
tools/scale100_r12.py, with the same per-stage REST metrics and
no-spill criterion as the read/write probes, raced against DuckDB
running the operator's own registered oracle on the same parquet.

The claim under test is the docstring's plan shape at scale: ONE hash
shuffle whose payload is the 5 projected columns (not the table), two
in-partition sorts, and a same-key partial aggregate — so shuffle
bytes stay O(rows x 5 narrow cols) and memory never spills even at
100x. Appends a "win_ohlc_bars@100x" section to tools/scale100_r12.log.

Usage: python tools/ohlc_scale_r12.py [--sf-dir /tmp/bootic_scale/100x_sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "32")
os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
os.environ["SPARK_GRAFT_AQE"] = "true"

from scale100_r11 import _spark, _stage_ids, _stage_metrics  # noqa: E402


def main(sf_dir: str) -> None:
    import duckdb

    import __spark_entry__ as entry

    spark = _spark()
    q = entry.queries()["win_ohlc_bars"]
    osql = entry.oracle_sql()["win_ohlc_bars"]

    # warm plan build, then timed executions (steady + fresh-plan)
    df = q(spark, sf_dir)
    before = _stage_ids(spark)
    t0 = time.perf_counter()
    # collect, NOT count: count() lets Catalyst prune every OHLC column
    # (group count needs only the keys) and the windows vanish from the
    # plan — the probe must pay for the real result
    n = len(df.collect())
    wall = round(time.perf_counter() - t0, 3)
    m = _stage_metrics(spark, before)

    con = duckdb.connect()
    # staged tables are Spark part-file directories, not single files
    pat = f"{sf_dir}/events.parquet/*.parquet"
    if os.path.isfile(f"{sf_dir}/events.parquet"):
        pat = f"{sf_dir}/events.parquet"
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pat}')"
    )
    t0 = time.perf_counter()
    dn = len(con.execute(osql).fetchall())
    dwall = round(time.perf_counter() - t0, 3)

    rec = {
        "probe": "win_ohlc_bars@100x",
        "sf_dir": sf_dir,
        "out_rows": n,
        "spark_wall_sec": wall,
        "duckdb_wall_sec": dwall,
        "ratio_vs_duckdb": round(wall / dwall, 3) if dwall else None,
        "stages": m,
        "no_spill": m["memory_spilled_bytes"] == 0
        and m["disk_spilled_bytes"] == 0,
        "duckdb_rows_match": dn == n,
    }
    print(json.dumps(rec, indent=1))
    log = os.path.join(REPO, "tools", "scale100_r12.log")
    with open(log, "a") as fh:
        fh.write("\n" + json.dumps(rec, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default="/tmp/bootic_scale/100x_sf0.1"
    )
    a = ap.parse_args()
    main(a.sf_dir)
