#!/usr/bin/env python
"""Scale-factor scaling curves for the headline + representative LLM ops.

Runs each selected registered query at sf0.001 / sf0.01 / sf0.1 with
FRESH per-execution timing (new lineage per sample, planning outside the
timer — same protocol as bench.py's ``queries_fresh`` series) and reports
the wall-clock at each sf plus the 0.01→0.1 growth ratio. The claim this
tool turns into a number: a 10x data step costs far less than 10x wall
clock on every linear-plan op (the fixed per-job floor dominates at these
sizes), and no op exhibits superlinear growth — the signature that the
plan would survive the 100x scale-up the brief asks about. A quadratic
corpus×corpus op would show ~100x on the 0.01→0.1 step; none does.

Usage: python tools/scaling_curve.py [query_id ...]
One JSON line per query: {"q": ..., "sec": {sf: t}, "ratio_01_to_1": r}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
}

DEFAULT = [
    # headline relational
    "agg_multi_rollup", "q3_topk_join", "agg_count_by_bucket",
    "rank_topk_per_group",
    # joins at scale
    "join_multiway", "join_skew_salted", "join_asof",
    # LLM pipeline representatives (linear-plan)
    "llm_exact_dedup", "llm_near_dedup", "llm_quality_filter",
    "llm_token_count", "llm_ann_lsh", "llm_semdedup_arrow",
    "llm_unigram_logprob", "llm_pack_sequences",
]


def _fresh_time(fn, spark, sf_dir: str, runs: int = 5) -> float:
    raw = getattr(fn, "__wrapped__", fn)
    raw(spark, sf_dir).collect()  # warm-up: code cache + page cache
    samples = []
    for _ in range(runs):
        df = raw(spark, sf_dir)
        try:
            df._jdf.queryExecution().executedPlan()
        except Exception:
            df.schema
        t0 = time.perf_counter()
        df.collect()
        samples.append(time.perf_counter() - t0)
    return min(samples)


def main() -> None:
    ids = sys.argv[1:] or DEFAULT

    # Same local-bench knobs as bench.py so the numbers here live on the
    # same scale as the recorded queries_fresh series (shuffle fan-out 4,
    # 4 MB splits, AQE off for interactive latency, fixture tables cached).
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024))
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")
    os.environ.setdefault("SPARK_GRAFT_CACHE_PARTS", "8")
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

    from bootic_stats_aggregates_spark.registry import all_queries
    from bootic_stats_aggregates_spark.session import get_spark

    queries = all_queries()
    spark = get_spark("scaling-curve")
    try:
        la1, la5, la15 = os.getloadavg()
        print(json.dumps({"host_load": [la1, la5, la15]}), flush=True)
    except OSError:
        pass

    for q in ids:
        fn = queries[q]
        sec = {}
        for sf, d in SF_DIRS.items():
            sec[sf] = round(_fresh_time(fn, spark, d), 4)
        ratio = round(sec["0.1"] / sec["0.01"], 2) if sec["0.01"] else None
        print(
            json.dumps({"q": q, "sec": sec, "ratio_01_to_1": ratio}),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
