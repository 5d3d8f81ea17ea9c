#!/usr/bin/env python
"""sf0.1 verification sweep for the quadratic-oracle operators.

The driver's correctness gate runs at sf0.01; every operator with a
linear-cost oracle is additionally swept at sf0.1 by tests/test_oracle.py.
Seven operators were excluded there because their DuckDB oracle twin is
quadratic (all-pairs) or recursive in the input size — fine at 500 docs,
hours at sf0.1 (5000 docs / 100k events). This sweep closes that gap
(VERDICT r2 item 9) by running BOTH engines on identical *bounded* inputs
derived from sf0.1: the quadratic table is sliced into id/time windows that
jointly cover every row, each slice is staged as a synthetic sf-dir
(filtered parquet + symlinks for the untouched tables), and the registered
Spark query is compared against its registered DuckDB oracle on each slice.

This verifies the operator's full code path on sf0.1-distribution data at a
pair-space the oracle can afford. Cross-slice pairs are (necessarily) not
enumerated — that is exactly the bound VERDICT r2 prescribed ("cap the
DuckDB side's pair space by pre-filtering doc_id ranges").

Usage: python tools/sweep_sf01.py [op[:slice_idx] ...]  → one JSON line per
(op, slice) plus a summary line. With no args, sweeps every op (long:
~3-5 min/slice on the DuckDB side — prefer one op, or one op:slice, per
invocation under a timeout).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STAGE_ROOT = "/tmp/bootic_sweep_sf01"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: op -> (sliced table, slice column, list of (lo, hi) half-open windows).
#: documents: 5000 docs -> 3 windows (~1667 docs, ~1.4M pairs each).
#: embeddings: 2000 rows -> 2 windows (1000 rows, 0.5M pairs each).
#: events: 100k rows -> 3 x 12k-row event_id windows (~7e7 cheap predicate
#: evals per slice in DuckDB; the |dt|<=eps density keeps output small).
_DOC_W = [(0, 1667), (1667, 3334), (3334, 5001)]
_EMB_W = [(0, 1000), (1000, 2001)]
_EVT_W = [(0, 12000), (44000, 56000), (88000, 100001)]

SWEEPS: dict[str, tuple[str, str, list[tuple[int, int]]]] = {
    "llm_ngram_jaccard": ("documents", "doc_id", _DOC_W),
    "llm_ngram_containment": ("documents", "doc_id", _DOC_W),
    "llm_near_dedup": ("documents", "doc_id", _DOC_W),
    "llm_dedup_clusters": ("documents", "doc_id", _DOC_W),
    # O(log^2 n) star-contraction CC: same pair graph as dedup_clusters,
    # recursive-CTE oracle -> bounded slices (VERDICT r3 item 6). The other
    # two ops that item named turned out linear-oracle and pass at FULL
    # sf0.1 in tests/test_oracle.py (llm_boilerplate_chunks,
    # llm_cooccurrence_pmi — 14 s for the pair, no slicing required).
    "llm_cc_star": ("documents", "doc_id", _DOC_W),
    "llm_simhash_pairs": ("documents", "doc_id", _DOC_W),
    "llm_dedup_cascade": ("documents", "doc_id", _DOC_W),
    "llm_embed_neardup": ("embeddings", "vec_id", _EMB_W),
    "join_range_bucketed": ("events", "event_id", _EVT_W),
    # r5 additions (VERDICT r4 item 9): SemDeDup's oracle is an equi-self-
    # join on cell (quadratic within cell), interval overlap's is the
    # same-user all-pairs inequality join — both bounded-sliced like their
    # family peers. Slicing is semantics-preserving: cell assignment is
    # per-vector and both engines see the identical slice, so the
    # keep/drop manifest of a slice is its own fixed point.
    "llm_semdedup": ("embeddings", "vec_id", _EMB_W),
    "llm_semdedup_arrow": ("embeddings", "vec_id", _EMB_W),
    "join_interval_overlap": ("events", "event_id", _EVT_W),
}


def stage_slice(table: str, col: str, lo: int, hi: int) -> str:
    """Synthetic sf-dir: `table` filtered to [lo, hi), everything else a
    symlink to the real sf0.1 fixture."""
    d = os.path.join(STAGE_ROOT, f"{table}_{lo}_{hi}")
    if os.path.exists(os.path.join(d, "_STAGED")):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for t in TABLES:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        if t != table:
            os.symlink(src, os.path.join(d, f"{t}.parquet"))
    con = duckdb.connect()
    # events.ts must stay an INSTANT type: a plain DuckDB TIMESTAMP writes
    # parquet isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ and
    # refuses to cast to double (the real fixture is TIMESTAMP(NANOS),
    # handled by io.table's nanosAsLong path instead).
    proj = "* REPLACE (CAST(ts AS TIMESTAMPTZ) AS ts)" if table == "events" else "*"
    con.execute(
        f"COPY (SELECT {proj} FROM read_parquet('{SF_DIR}/{table}.parquet') "
        f"WHERE {col} >= {lo} AND {col} < {hi}) "
        f"TO '{d}/{table}.parquet' (FORMAT PARQUET)"
    )
    con.close()
    open(os.path.join(d, "_STAGED"), "w").close()
    return d


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.round(6)
        elif s.dtype == object:
            pdf[c] = s.map(lambda v: None if v is None else str(v))
    return pdf.sort_values(list(pdf.columns), na_position="last").reset_index(
        drop=True
    )


def main() -> None:
    from bootic_stats_aggregates_spark.registry import all_oracles, all_queries
    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("sweep-sf01")
    spark.sparkContext.setLogLevel("ERROR")
    queries, osql = all_queries(), all_oracles()

    wanted: dict[str, int | None] = {}
    for arg in sys.argv[1:]:
        op, _, idx = arg.partition(":")
        wanted[op] = int(idx) if idx else None
    if not wanted:
        wanted = {op: None for op in SWEEPS}
    results: dict[str, bool] = {}
    timings: dict[str, dict] = {}
    for op, (table, col, windows) in SWEEPS.items():
        if op not in wanted:
            continue
        if wanted[op] is not None:
            windows = [windows[wanted[op]]]
        ok = True
        op_spark_sec = op_duck_sec = 0.0
        for lo, hi in windows:
            d = stage_slice(table, col, lo, hi)
            t0 = time.perf_counter()
            a = _norm(queries[op](spark, d).toPandas())
            spark_sec = round(time.perf_counter() - t0, 3)
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{d}/{t}.parquet')"
                )
            t0 = time.perf_counter()
            b = _norm(con.execute(osql[op]).fetch_df())
            duck_sec = round(time.perf_counter() - t0, 3)
            con.close()
            match = a.shape == b.shape and bool(
                a.astype(object)
                .where(pd.notnull(a), None)
                .equals(b.astype(object).where(pd.notnull(b), None))
            )
            print(
                json.dumps(
                    {
                        "op": op,
                        "slice": f"{table}[{lo},{hi})",
                        "spark_rows": int(a.shape[0]),
                        "oracle_rows": int(b.shape[0]),
                        "match": match,
                        # wall times (VERDICT r12 task 8): spark_sec is
                        # build+execute+toPandas of the registered op on
                        # the slice, duck_sec the oracle's — recorded so
                        # dedup/ANN perf drift is adjudicable from the
                        # log without a re-run (same-host A/B still the
                        # rule for verdicts — see bench_triage_r*.md)
                        "spark_sec": spark_sec,
                        "duck_sec": duck_sec,
                    }
                ),
                flush=True,
            )
            ok = ok and match
            op_spark_sec += spark_sec
            op_duck_sec += duck_sec
        results[op] = ok
        timings[op] = {
            "spark_sec": round(op_spark_sec, 3),
            "duck_sec": round(op_duck_sec, 3),
        }
    print(json.dumps({"sweep": "sf0.1-bounded", "results": results}))
    # merge the per-op timings into BENCH_FULL.json (only on a FULL
    # sweep — a single-op invocation shouldn't clobber the record)
    if not sys.argv[1:]:
        bf = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_FULL.json",
        )
        try:
            full = json.load(open(bf))
        except (OSError, ValueError):
            full = {}
        full["sweep_sf01"] = {
            "results": {k: bool(v) for k, v in results.items()},
            "timings": timings,
        }
        with open(bf, "w") as fh:
            json.dump(full, fh, indent=1)
    if not all(results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
