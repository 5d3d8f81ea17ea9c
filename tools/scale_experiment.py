#!/usr/bin/env python
"""One-off config experiments for the replicated-scale bench.

Usage: python tools/scale_experiment.py [runs]
Env: SPARK_GRAFT_AQE, SPARK_GRAFT_CACHE_TABLES, SPARK_GRAFT_SHUFFLE,
     SPARK_GRAFT_MAX_PARTITION_BYTES, SCALE_EXP_PLAN=qid (print plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from bootic_stats_aggregates_spark.io import table
    from bootic_stats_aggregates_spark.registry import all_queries
    from bootic_stats_aggregates_spark.scalebench import HEADLINE, stage_replicated
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("scale-exp")
    spark.sparkContext.setLogLevel("ERROR")
    dest = stage_replicated(spark)
    queries = all_queries()
    if os.environ.get("SCALE_EXP_PLAN"):
        qid = os.environ["SCALE_EXP_PLAN"]
        fn = getattr(queries[qid], "__wrapped__", queries[qid])
        fn(spark, dest).explain("formatted")
        return
    if os.environ.get("SPARK_GRAFT_CACHE_TABLES") == "1":
        for t in ("lineitem", "orders", "customer", "events"):
            table(spark, dest, t).count()  # materialize the cache
    out = {}
    for name, qid in HEADLINE.items():
        fn = queries[qid]
        raw = getattr(fn, "__wrapped__", fn)
        raw(spark, dest).collect()
        samples = []
        for _ in range(runs):
            df = raw(spark, dest)
            try:
                df._jdf.queryExecution().executedPlan()
            except Exception:
                df.schema
            t0 = time.perf_counter()
            df.collect()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 4)
    cfg = {
        k: os.environ.get(k)
        for k in (
            "SPARK_GRAFT_AQE",
            "SPARK_GRAFT_CACHE_TABLES",
            "SPARK_GRAFT_SHUFFLE",
            "SPARK_GRAFT_MAX_PARTITION_BYTES",
            "SPARK_GRAFT_CACHE_PARTS",
        )
    }
    print(json.dumps({"cfg": cfg, "times": out, "suite": round(sum(out.values()), 4)}))


if __name__ == "__main__":
    main()
