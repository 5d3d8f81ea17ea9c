#!/usr/bin/env python
"""Round-13 plan audit (optimization guide §1): capture
``explain("formatted")`` for EVERY registered query at the bench scale
factor and emit a mechanical plan-health summary per query:

- number of Exchange nodes (shuffles)
- Python-boundary nodes (BatchEvalPython / ArrowEvalPython / MapInArrow /
  MapInPandas / FlatMapGroupsInPandas)
- join strategies present (BroadcastHashJoin / SortMergeJoin /
  ShuffledHashJoin / BroadcastNestedLoopJoin / CartesianProduct)
- parquet scans with empty PushedFilters while the query filters
- ReadSchema width per scan (column pruning evidence)

Usage: python tools/plan_audit_r13.py [outdir] [suffix]
  outdir default plans/r13, suffix default "before".

Writes plans/r13/<qid>_<suffix>.txt and tools/plan_audit_r13_<suffix>.jsonl.
Builders run under the bench env (AQE off, 8 shuffle parts) so the captured
plans match what bench.py executes.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def summarize(plan: str) -> dict:
    s: dict = {}
    s["exchanges"] = len(re.findall(r"\bExchange\b", plan))
    s["reused_exchanges"] = len(re.findall(r"\bReusedExchange\b", plan))
    for node in (
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInArrow",
        "MapInPandas",
        "FlatMapGroupsInPandas",
        "PythonMapInArrow",
        "BatchEvalPythonUDTF",
    ):
        n = len(re.findall(rf"\b{node}\b", plan))
        if n:
            s.setdefault("python_nodes", {})[node] = n
    for node in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        n = len(re.findall(rf"\b{node}\b", plan))
        if n:
            s.setdefault("joins", {})[node] = n
    s["window_nodes"] = len(re.findall(r"\bWindow\b", plan))
    s["sorts"] = len(re.findall(r"^\s*[+:]?-?\s*\*?\(?\d*\)?\s*Sort\b", plan, re.M))
    # PushedFilters per scan
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    s["scans"] = len(re.findall(r"Scan parquet|BatchScan|Scan ExistingRDD|Scan orc|Scan csv|Scan json|Scan text", plan))
    s["scans_with_pushed"] = sum(1 for p in pushed if p.strip())
    s["scans_pushed_empty"] = sum(1 for p in pushed if not p.strip())
    widths = [len(r.split(",")) for r in re.findall(r"ReadSchema: struct<([^>]*)>", plan)]
    if widths:
        s["read_schema_widths"] = widths
    return s


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(outdir, exist_ok=True)

    # Match the bench env exactly (bench.py main()).
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024))
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")
    os.environ.setdefault("SPARK_GRAFT_CACHE_PARTS", "8")
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_CKPT_DIR", "/dev/shm/bootic_ckpt")

    from bootic_stats_aggregates_spark.registry import all_queries
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("plan-audit-r13")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    summary_path = os.environ.get("PLAN_AUDIT_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"plan_audit_r13_{suffix}.jsonl"
    )
    mode = "a" if only else "w"
    with open(summary_path, mode) as out:
        for qid, fn in sorted(queries.items()):
            if only and qid not in only:
                continue
            spark.sparkContext.setJobDescription(f"plan-audit:{qid}")
            t0 = time.perf_counter()
            rec: dict = {"qid": qid}
            try:
                df = fn(spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                rec["build_sec"] = round(time.perf_counter() - t0, 3)
                rec.update(summarize(plan))
                with open(os.path.join(outdir, f"{qid}_{suffix}.txt"), "w") as fh:
                    fh.write(plan)
            except Exception as exc:  # keep auditing the rest
                rec["error"] = repr(exc)[:300]
            out.write(json.dumps(rec) + "\n")
            out.flush()
    print(f"wrote {summary_path} and {outdir}/*_{suffix}.txt")


if __name__ == "__main__":
    main()
