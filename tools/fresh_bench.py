#!/usr/bin/env python
"""Isolated fresh-execution timing: one FRESH JVM for a group of queries.

The r7 bench adjudication (tools/bench_adjudication_r7.md) showed the
in-suite fresh numbers for the ANN/dedup group degrade with suite
position — llm_near_dedup measures 3.15 s after ~200 queries on a
long-lived JVM vs 1.80 s in a fresh one (GC pressure + code-cache
occupancy, not the operator). This runner gives each group its own JVM
so the recorded number measures the QUERY, not the session's history;
bench.py shells out to it and falls back inline if the spawn fails.

Usage: python tools/fresh_bench.py <sf_dir> <runs> name=qid [name=qid ...]
Prints ONE JSON object {name: seconds}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, runs = sys.argv[1], int(sys.argv[2])
    pairs = [a.split("=", 1) for a in sys.argv[3:]]

    from bootic_stats_aggregates_spark.registry import all_queries
    from bootic_stats_aggregates_spark.session import get_spark

    import bench

    spark = get_spark("bootic-fresh-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out = {
        name: round(bench._time_query_fresh(queries[qid], spark, sf_dir, runs), 4)
        for name, qid in pairs
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
