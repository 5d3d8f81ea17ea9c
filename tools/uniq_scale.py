#!/usr/bin/env python
"""Distinct-counting strategy comparison at scale (README "uniques" note).

The engine registers THREE uniques strategies (SURVEY §2.11):

* exact ``count_distinct``  — two-phase expand, partials are raw key sets;
* ``approx_count_distinct`` / datasketches HLL — mergeable, ~2% error;
* bitmap (``bitmap_construct_agg``/``bitmap_or_agg``/``bitmap_count``) —
  mergeable AND exact, 512-byte partials per 4096-id bucket.

This tool measures all three on the same replicated events input so the
trade-off the operator docstrings claim is a number, not an assertion:
at dense key spaces the bitmap should land near HLL cost while staying
exact; exact distinct pays the expand shuffle.

Usage: python tools/uniq_scale.py [replications ...]   (default 10 100)
Prints one JSON line per replication factor: wall seconds per strategy,
same grouping (event_type, day) for all three.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [10, 100]

    from pyspark.sql import functions as F

    from bootic_stats_aggregates_spark.io import table
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("uniq-scale")
    ev0 = table(spark, SF_DIR, "events").select("event_type", "ts", "user_id")

    # id-space density decides the bitmap strategy's fate: per 4096-id
    # bucket the partial is a fixed 512 B, so dense ids amortize buckets
    # and sparse ids pay one bitmap per few members. Measure both.
    u_span = ev0.agg(F.max("user_id")).collect()[0][0] + 1
    density = os.environ.get("SPARK_GRAFT_UNIQ_DENSITY", "dense")
    stride = u_span if density == "dense" else 1_000_000

    for n in reps:
        # replicate with perturbed user ids so cardinality grows with n
        # (pure copies would measure dedup of identical sets)
        reps_df = spark.range(n).withColumnRenamed("id", "rep")
        ev = ev0.crossJoin(reps_df).select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            (F.col("user_id") + F.col("rep") * F.lit(stride)).alias("uid"),
        )
        ev = ev.repartition(32).persist()
        total = ev.count()  # materialize once; all strategies read the cache

        def run(tag, agg_fn):
            t0 = time.monotonic()
            out = agg_fn().collect()
            dt = round(time.monotonic() - t0, 3)
            chk = sum(r[-1] for r in out)
            return dt, chk

        t_exact, c_exact = run(
            "exact",
            lambda: ev.groupBy("event_type", "day").agg(
                F.countDistinct("uid").alias("u")
            ),
        )
        t_hll, c_hll = run(
            "hll",
            lambda: ev.groupBy("event_type", "day").agg(
                F.approx_count_distinct("uid", 0.02).alias("u")
            ),
        )
        t_bitmap, c_bitmap = run(
            "bitmap",
            lambda: ev.groupBy(
                "event_type", "day", F.bitmap_bucket_number("uid").alias("b")
            )
            .agg(F.bitmap_construct_agg(F.bitmap_bit_position("uid")).alias("bm"))
            .groupBy("event_type", "day")
            .agg(F.sum(F.bitmap_count("bm")).alias("u")),
        )
        ev.unpersist()
        print(
            json.dumps(
                {
                    "replication": n,
                    "density": density,
                    "rows": total,
                    "exact_sec": t_exact,
                    "hll_sec": t_hll,
                    "bitmap_sec": t_bitmap,
                    "exact_sum": c_exact,
                    "hll_sum": c_hll,
                    "bitmap_sum": c_bitmap,
                    "bitmap_exact_ok": c_bitmap == c_exact,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
