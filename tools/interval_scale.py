#!/usr/bin/env python
"""Interval-overlap join scaling: events/s of the bucketed equi-join.

join_interval_overlap's scale claim: exploding each interval to its
spanned fixed-width buckets collapses the overlap pair space to a
(user, bucket) EQUI-join + residual filter — linear in input, with each
pair emitted exactly once (greatest-starts bucket ownership), never the
quadratic inequality join. This tool measures that pipeline on synthetic
view/buy streams of growing size: alternating events 400 s apart per
user, so each 600 s view window overlaps the following buy — match
density stays ~0.5/event at every size and the measured rate isolates
the join machinery.

Usage: python tools/interval_scale.py [n ...] (default 100000 400000 1600000)
One JSON line per n.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIEW_SEC = 600.0
BUY_SEC = 300.0
W = 600.0
GAP = 400.0  # inter-event spacing per user: next buy falls inside the window


def main() -> None:
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.session import get_spark

    ns = [int(a) for a in sys.argv[1:]] or [100_000, 400_000, 1_600_000]
    spark = get_spark("interval-scale")
    spark.sparkContext.setLogLevel("ERROR")

    for n in ns:
        users = n // 50
        ev = spark.range(n).select(
            (F.col("id") % users).alias("user_id"),
            F.col("id").alias("event_id"),
            (F.floor(F.col("id") / users) * GAP).alias("s"),
            (F.floor(F.col("id") / users) % 2).alias("kind"),  # 0=view 1=buy
        )

        def side(kind: int, length: float, ida: str, sa: str):
            return ev.filter(F.col("kind") == kind).select(
                F.col("event_id").alias(ida),
                "user_id",
                F.col("s").alias(sa),
                F.explode(
                    F.sequence(
                        F.floor(F.col("s") / W).cast("long"),
                        F.floor((F.col("s") + length) / W).cast("long"),
                    )
                ).alias("bk"),
            )

        v = side(0, VIEW_SEC, "view_id", "v_s")
        p = side(1, BUY_SEC, "buy_id", "p_s")
        g = F.greatest(F.col("v_s"), F.col("p_s"))
        joined = (
            v.join(p, ["user_id", "bk"])
            .filter(
                (F.col("v_s") <= F.col("p_s") + BUY_SEC)
                & (F.col("p_s") <= F.col("v_s") + VIEW_SEC)
                & (F.floor(g / W).cast("long") == F.col("bk"))
            )
            .select(
                "view_id",
                "buy_id",
                (
                    F.least(F.col("v_s") + VIEW_SEC, F.col("p_s") + BUY_SEC) - g
                ).alias("ov"),
            )
        )
        # aggregate over the computed overlap so nothing prunes the join
        probe = joined.agg(
            F.count(F.lit(1)).alias("pairs"), F.sum("ov").alias("ov_sum")
        )
        probe.collect()  # warm-up
        t0 = time.perf_counter()
        row = probe.collect()[0]
        sec = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "n_events": n,
                    "overlap_pairs": row.pairs,
                    "sec": round(sec, 3),
                    "events_per_sec": round(n / sec),
                }
            )
        )


if __name__ == "__main__":
    main()
