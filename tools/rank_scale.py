#!/usr/bin/env python
"""Two-phase distributed rank vs naive global-window rank (README note).

llm_corpus_shuffle computes a total-order rank WITHOUT a global window:
range-bucket the hash space, per-bucket row_number (distributed), plus a
broadcast prefix-sum of bucket counts. The naive alternative —
``row_number() OVER (ORDER BY h)`` — drags every row through ONE
partition. This tool measures both on synthetic keys so the claimed
scale win is a number; it also asserts the two produce identical ranks.

Usage: python tools/rank_scale.py [n_rows ...]   (default 1000000 5000000)
One JSON line per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 5_000_000]

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.operators.sampling import (
        HASH_A,
        HASH_C,
        HASH_P,
    )
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("rank-scale")
    n_buckets = 1024
    width = HASH_P // n_buckets + 1

    for n in sizes:
        base = spark.range(n).select(F.col("id").alias("doc_id"))
        h = (F.col("doc_id") * F.lit(HASH_A) + F.lit(HASH_C)) % F.lit(HASH_P)
        keyed = base.select("doc_id", h.alias("h")).repartition(32).persist()
        keyed.count()

        t0 = time.monotonic()
        w_naive = Window.orderBy(F.col("h").asc(), F.col("doc_id").asc())
        naive = keyed.select(
            "doc_id", F.row_number().over(w_naive).cast("long").alias("r")
        )
        naive_chk = naive.agg(
            F.sum(F.col("r") * (F.col("doc_id") % 997)).alias("s")
        ).collect()[0].s
        t_naive = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        hb = F.floor(F.col("h") / F.lit(width)).alias("hb")
        bkt = keyed.select("doc_id", "h", hb)
        counts = bkt.groupBy("hb").agg(F.count(F.lit(1)).alias("c"))
        off_w = Window.orderBy("hb").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = counts.select(
            "hb", F.coalesce(F.sum("c").over(off_w), F.lit(0)).alias("off")
        )
        intra = Window.partitionBy("hb").orderBy(
            F.col("h").asc(), F.col("doc_id").asc()
        )
        two_phase = bkt.join(F.broadcast(offsets), "hb").select(
            "doc_id",
            (F.col("off") + F.row_number().over(intra)).cast("long").alias("r"),
        )
        two_chk = two_phase.agg(
            F.sum(F.col("r") * (F.col("doc_id") % 997)).alias("s")
        ).collect()[0].s
        t_two = round(time.monotonic() - t0, 3)

        keyed.unpersist()
        print(
            json.dumps(
                {
                    "rows": n,
                    "naive_global_window_sec": t_naive,
                    "two_phase_sec": t_two,
                    "speedup": round(t_naive / t_two, 2),
                    "identical_ranks": naive_chk == two_chk,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
