#!/usr/bin/env python
"""CLI for the replicated-scale fresh-execution bench (VERDICT r5 task #1).

Stages a key-shifted ~10x replication of sf0.1 under /tmp/bootic_scale and
races the four headline queries fresh on BOTH engines over the same bytes.

Usage: python tools/scale_bench.py [mult] [runs]   (default 10 5)
Prints one JSON line (the same dict bench.py embeds as "scale10").
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    # grid-searched at 10x (r6): 32 MB splits + 8 shuffle partitions beat
    # 8 MB/32 on every headline query — at ~200 MB total the shuffle-file
    # fan-out of 32 partitions costs more than the parallelism buys.
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(32 * 1024 * 1024))
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

    from bootic_stats_aggregates_spark.scalebench import run_scale_bench
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = run_scale_bench(spark, mult=mult, runs=runs)
    try:
        la1, la5, la15 = os.getloadavg()
        out["host_load"] = {"load1": round(la1, 2), "load5": round(la5, 2)}
    except OSError:
        pass
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
