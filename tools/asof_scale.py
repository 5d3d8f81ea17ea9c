#!/usr/bin/env python
"""As-of join scaling: events/s of the union + carry-forward pipeline.

The as-of family's scale claim is that it is LINEAR — one shuffle on
user_id, one sort, zero pair blow-up — unlike an inequality self-join
whose candidate space is quadratic per user. This tool measures the
backward as-of (the shared _asof_union/_asof_window scaffold) on
synthetic view/click streams of growing size: events/s should hold
roughly constant across a 16x size range if the claim is true.

Synthesis: n events over n/50 users, alternating views/clicks with
per-user monotone timestamps — the same shape as the fixture but
size-parameterized.

Usage: python tools/asof_scale.py [n ...]   (default 100000 400000 1600000)
One JSON line per n.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.session import get_spark

    ns = [int(a) for a in sys.argv[1:]] or [100_000, 400_000, 1_600_000]
    spark = get_spark("asof-scale")
    spark.sparkContext.setLogLevel("ERROR")

    for n in ns:
        users = n // 50
        ev = spark.range(n).select(
            (F.col("id") % users).alias("user_id"),
            F.col("id").alias("event_id"),
            # per-user monotone "timestamp"; kind alternates WITHIN the
            # user's own timeline (id % users stride would give each user
            # a single parity when the stride is even — every click would
            # then carry NULL and the probe would measure nothing)
            F.floor(F.col("id") / users).cast("long").alias("ts"),
            (F.floor(F.col("id") / users) % 2).alias("kind"),
        )
        views = ev.filter(F.col("kind") == 0).withColumn(
            "view_ts", F.col("ts")
        )
        clicks = ev.filter(F.col("kind") == 1).withColumn(
            "view_ts", F.lit(None).cast("long")
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "kind", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        asof = (
            views.unionByName(clicks)
            .withColumn("asof_ts", F.last("view_ts", ignorenulls=True).over(w))
            .filter(F.col("kind") == 1)
        )
        # aggregate over the CARRIED column: a bare count() lets Catalyst
        # prune the window projection and the measurement collapses to
        # range+filter (observed: a bogus 100M events/s)
        probe = asof.agg(
            F.count("asof_ts").alias("n"), F.sum("asof_ts").alias("s")
        )
        probe.collect()  # warm-up
        t0 = time.perf_counter()
        row = probe.collect()[0]
        rows = row.n
        sec = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "n_events": n,
                    "asof_rows": rows,
                    "sec": round(sec, 3),
                    "events_per_sec": round(n / sec),
                }
            )
        )


if __name__ == "__main__":
    main()
