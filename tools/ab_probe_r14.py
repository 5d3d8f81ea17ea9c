#!/usr/bin/env python
"""One A/B probe sample (VERDICT r13 task 4): run the four headline
queries (steady + fresh) and the streaming rollup rate in a FRESH JVM for
the repo checkout given as argv[1], and print one JSON line.

Self-contained: does not import the target repo's tools/ — only its
package — so the same probe binary runs unmodified against the r12
round-end tree, the r13 round-end tree, and r14 HEAD. The env is pinned
to the r12/r13 bench constants (SHUFFLE=4, CACHE_PARTS=8, AQE off,
cached tables) for ALL trees, so differences isolate CODE, not the r14
core-scaled env defaults.

Usage: python tools/ab_probe_r14.py <repo_root> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = sys.argv[1]
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 13
sys.path.insert(0, REPO)

os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"] = str(4 * 1024 * 1024)
os.environ["SPARK_GRAFT_SHUFFLE"] = "4"
os.environ["SPARK_GRAFT_CACHE_PARTS"] = "8"
os.environ["SPARK_GRAFT_AQE"] = "false"
os.environ["SPARK_GRAFT_CACHE_TABLES"] = "1"
if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_CKPT_DIR", "/dev/shm/bootic_ckpt")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = {
    "q1_pricing": "agg_sum_avg_minmax",
    "q3_join_topk": "q3_topk_join",
    "events_rollup": "agg_count_by_bucket",
    "topk_per_group": "rank_topk_per_group",
}


def main() -> None:
    from bootic_stats_aggregates_spark.registry import all_queries
    from bootic_stats_aggregates_spark.session import get_spark

    la1 = os.getloadavg()[0]
    spark = get_spark("ab-probe-r14")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    steady: dict[str, float] = {}
    for name, qid in HEADLINE.items():
        fn = queries[qid]
        fn(spark, SF_DIR).collect()  # warm-up
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            samples.append(time.perf_counter() - t0)
        steady[name] = round(min(samples), 4)

    fresh: dict[str, float] = {}
    for name, qid in HEADLINE.items():
        raw = getattr(queries[qid], "__wrapped__", queries[qid])
        raw(spark, SF_DIR).collect()
        samples = []
        for _ in range(max(RUNS // 2, 5)):
            df = raw(spark, SF_DIR)
            try:
                df._jdf.queryExecution().executedPlan()
            except Exception:
                df.schema
            t0 = time.perf_counter()
            df.collect()
            samples.append(time.perf_counter() - t0)
        fresh[name] = round(min(samples), 4)

    raw = getattr(
        queries["stream_tumbling"], "__wrapped__", queries["stream_tumbling"]
    )
    raw(spark, SF_DIR).collect()  # warm-up
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        raw(spark, SF_DIR).collect()
        samples.append(time.perf_counter() - t0)
    stream_sec = min(samples)
    from bootic_stats_aggregates_spark.io import table

    n_events = table(spark, SF_DIR, "events").count()

    print(
        json.dumps(
            {
                "repo": REPO,
                "steady": steady,
                "steady_suite": round(sum(steady.values()), 4),
                "fresh": fresh,
                "fresh_suite": round(sum(fresh.values()), 4),
                "stream_events_per_sec": round(n_events / stream_sec),
                "load1_at_start": round(la1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
