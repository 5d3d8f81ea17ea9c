#!/usr/bin/env python
"""r14 probe (VERDICT r13 task 5): pin the map-side group-key sort cost of
the min_by/max_by SortAggregate forms — win_ohlc_bars and llm_exact_dedup —
at 100x scale, against the r12 window forms they replaced.

Why: min_by's struct buffer is not hash-agg mutable, so the r13 rewrites
plan as a partial-aggregated SORT-aggregate pair (map-side sort by the
GROUP key, then streaming partial agg). The r13 prose overclaimed "hash
aggregate, no sorts"; the honest question is whether the residual map-side
sort matters next to the removed full shuffle+total-order sorts. Three
timings per operator, same staged data, noop sink, min of RUNS:

- ``minby``   — the registered r13/r14 form (SortAggregate pair).
- ``window``  — the r12 row_number formulation (shuffles EVERY row, then
  sorts each partition by the full total order; twice for OHLC).
- ``hashonly``— a pure-HashAggregate control with the same scan, same
  group keys, same exchange, but only hash-capable aggregates (min/max/
  count). ``minby - hashonly`` isolates what the sort-agg form pays for
  the min_by pick (map-side group-key sort + struct eval + sort-agg
  instead of hash-agg).

Criterion (VERDICT): sort residual (minby - hashonly) < 10% of the window
form's wall. Appends a JSON block to tools/ohlc_sortcost_r14.log.

Usage: python tools/ohlc_sortcost_r14.py [mult]   (default 100)
"""

from __future__ import annotations

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

SF_DIR = "/root/testdata/sf0.1"
STAGE = "/tmp/bootic_scale/sortcost_{mult}x"
RUNS = 3


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(spark, build, label: str) -> tuple[float, dict]:
    """min-of-RUNS fresh noop executions with the plan built outside the
    timer (the noop_bench discipline) + the LAST run's stage shuffle
    metrics (REST; local mode makes shuffle memory-speed, so bytes —
    the quantity that rules at cluster scale, guide §2.2/2.3 — must be
    recorded separately from wall)."""
    from scale100_r11 import _stage_ids, _stage_metrics

    _noop(build())  # warm-up
    samples = []
    metrics: dict = {}
    for i in range(RUNS):
        df = build()
        try:
            df._jdf.queryExecution().executedPlan()
        except Exception:
            df.schema
        spark.sparkContext.setJobDescription(f"sortcost:{label}:{i}")
        before = _stage_ids(spark) if i == RUNS - 1 else None
        t0 = time.perf_counter()
        _noop(df)
        samples.append(time.perf_counter() - t0)
        if before is not None:
            m = _stage_metrics(spark, before)
            metrics = {
                "shuffle_write_bytes": m.get("shuffle_write_bytes"),
                "shuffle_read_bytes": m.get("shuffle_read_bytes"),
                "memory_spilled_bytes": m.get("memory_spilled_bytes"),
                "disk_spilled_bytes": m.get("disk_spilled_bytes"),
            }
    return round(min(samples), 3), metrics


def stage(spark, mult: int) -> str:
    """Replicate events (event_id-shifted) and documents (doc_id-shifted)
    mult-x into part-file dirs; idempotent via marker."""
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.io import table

    dest = STAGE.format(mult=mult)
    marker = os.path.join(dest, "_STAGED")
    if os.path.exists(marker):
        return dest
    import shutil

    shutil.rmtree(dest, ignore_errors=True)
    for tbl, key in (("events", "event_id"), ("documents", "doc_id")):
        df = table(spark, SF_DIR, tbl)
        stride = int(df.agg(F.max(key)).collect()[0][0]) + 1
        rep = (
            df.withColumn(
                "__c", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            )
            .withColumn(key, F.col(key) + F.col("__c") * F.lit(stride))
            .drop("__c")
        )
        rep.repartition(32).write.mode("overwrite").parquet(
            os.path.join(dest, f"{tbl}.parquet")
        )
    with open(marker, "w") as fh:
        fh.write(json.dumps({"mult": mult, "src": SF_DIR}))
    return dest


def main(mult: int) -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from scale100_r11 import _spark

    from bootic_stats_aggregates_spark.helpers import lcount
    from bootic_stats_aggregates_spark.io import table

    spark = _spark()  # UI on: REST stage metrics (shuffle bytes)
    spark.sparkContext.setLogLevel("ERROR")
    dest = stage(spark, mult)
    n_ev = table(spark, dest, "events").count()
    n_doc = table(spark, dest, "documents").count()

    out: dict = {"mult": mult, "rows_events": n_ev, "rows_documents": n_doc}

    # ---- win_ohlc_bars ----
    def ohlc_minby():
        from bootic_stats_aggregates_spark.operators.windows import (
            win_ohlc_bars,
        )

        return getattr(win_ohlc_bars, "__wrapped__", win_ohlc_bars)(
            spark, dest
        )

    def ohlc_window():
        ev = table(spark, dest, "events")
        d = F.date_trunc("day", "ts").alias("d")
        r = ev.select("event_type", d, "ts", "event_id", "value")
        wa = (
            Window.partitionBy("event_type", "d")
            .orderBy(
                F.asc_nulls_first("ts"),
                F.asc_nulls_first("event_id"),
                F.asc_nulls_first("value"),
            )
        )
        wd = (
            Window.partitionBy("event_type", "d")
            .orderBy(
                F.desc_nulls_last("ts"),
                F.desc_nulls_last("event_id"),
                F.desc_nulls_last("value"),
            )
        )
        rr = r.withColumn("rn_a", F.row_number().over(wa)).withColumn(
            "rn_d", F.row_number().over(wd)
        )
        return rr.groupBy("event_type", "d").agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias(
                "close_v"
            ),
            lcount("n"),
        )

    def ohlc_hashonly():
        ev = table(spark, dest, "events")
        d = F.date_trunc("day", "ts").alias("d")
        return (
            ev.select("event_type", d, "value")
            .groupBy("event_type", "d")
            .agg(
                F.max("value").alias("high_v"),
                F.min("value").alias("low_v"),
                lcount("n"),
            )
        )

    a, am = _time(spark, ohlc_minby, "ohlc_minby")
    b, bm = _time(spark, ohlc_window, "ohlc_window")
    c, cm = _time(spark, ohlc_hashonly, "ohlc_hashonly")
    out["win_ohlc_bars"] = {
        "minby_sec": a,
        "window_sec": b,
        "hashonly_sec": c,
        "sort_residual_sec": round(a - c, 3),
        "residual_vs_window_pct": round(100.0 * (a - c) / b, 1),
        "criterion_lt_10pct": (a - c) < 0.10 * b,
        "minby_metrics": am,
        "window_metrics": bm,
        "hashonly_metrics": cm,
    }

    # ---- llm_exact_dedup ----
    def dedup_minby():
        from bootic_stats_aggregates_spark.llm.dedup import llm_exact_dedup

        return getattr(llm_exact_dedup, "__wrapped__", llm_exact_dedup)(
            spark, dest
        )

    def dedup_window():
        d = table(spark, dest, "documents")
        w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
        return (
            d.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .select("doc_id", "lang", "source", "n_chars")
        )

    def dedup_hashonly():
        d = table(spark, dest, "documents")
        return (
            d.groupBy(F.sha2("text", 256).alias("__h"))
            .agg(F.min("doc_id").alias("doc_id"), lcount("n"))
            .select("doc_id", "n")
        )

    a, am = _time(spark, dedup_minby, "dedup_minby")
    b, bm = _time(spark, dedup_window, "dedup_window")
    c, cm = _time(spark, dedup_hashonly, "dedup_hashonly")
    out["llm_exact_dedup"] = {
        "minby_sec": a,
        "window_sec": b,
        "hashonly_sec": c,
        "sort_residual_sec": round(a - c, 3),
        "residual_vs_window_pct": round(100.0 * (a - c) / b, 1),
        "criterion_lt_10pct": (a - c) < 0.10 * b,
        "minby_metrics": am,
        "window_metrics": bm,
        "hashonly_metrics": cm,
    }

    log = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ohlc_sortcost_r14.log")
    with open(log, "a") as fh:
        fh.write(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
