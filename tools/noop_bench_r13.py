#!/usr/bin/env python
"""Round-13 per-operator timing triage (optimization guide §1.4): time every
registered query's FRESH execution into the noop sink at the bench scale
factor — computation only, no sink cost, no result transfer to the driver.

Two numbers per query:
- ``build_sec``: builder call (includes any staging work the op performs —
  MiniLog table builds, AvailableNow stream runs, broadcast warmups);
  measured on the FIRST build only (later builds hit staged fixtures).
- ``noop_sec``: min over RUNS re-executions of the ready plan via
  ``df.write.format("noop")`` with the plan rebuilt per run from the
  unmemoized builder (full stage recompute — the fresh protocol).

Usage: python tools/noop_bench_r13.py [runs] [qid,qid,...]
Writes tools/noop_bench_r13.jsonl (append when a qid filter is given);
override the output path with $NOOP_BENCH_OUT (used for the _after series
so before/after stay in separate files).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024))
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")
    os.environ.setdefault("SPARK_GRAFT_CACHE_PARTS", "8")
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_CKPT_DIR", "/dev/shm/bootic_ckpt")

    from bootic_stats_aggregates_spark.registry import all_queries
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("noop-bench-r13")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    out_path = os.environ.get("NOOP_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "noop_bench_r13.jsonl"
    )
    mode = "a" if only else "w"
    with open(out_path, mode) as out:
        for qid, fn in sorted(queries.items()):
            if only and qid not in only:
                continue
            rec: dict = {"qid": qid}
            try:
                spark.sparkContext.setJobDescription(f"noop-build:{qid}")
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                rec["build_sec"] = round(time.perf_counter() - t0, 3)
                raw = getattr(fn, "__wrapped__", fn)
                # warm-up execution (code cache, page cache)
                spark.sparkContext.setJobDescription(f"noop-warm:{qid}")
                df.write.format("noop").mode("overwrite").save()
                samples = []
                for i in range(runs):
                    fresh = raw(spark, SF_DIR)
                    try:
                        fresh._jdf.queryExecution().executedPlan()
                    except Exception:
                        fresh.schema
                    spark.sparkContext.setJobDescription(f"noop-run{i}:{qid}")
                    t0 = time.perf_counter()
                    fresh.write.format("noop").mode("overwrite").save()
                    samples.append(time.perf_counter() - t0)
                rec["noop_sec"] = round(min(samples), 4)
                rec["noop_all"] = [round(s, 4) for s in samples]
            except Exception as exc:
                rec["error"] = repr(exc)[:300]
            out.write(json.dumps(rec) + "\n")
            out.flush()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
