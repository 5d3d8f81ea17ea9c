#!/usr/bin/env python
"""Full driver simulation: every registered (query, oracle) pair compared
in a FRESH process whose SparkSession carries a hostile (non-UTC) session
timezone — the exact conditions the external driver imposes, applied to
the WHOLE registry instead of the 50-row gate.

Usage: python tools/driver_sim.py [start] [end]   (slice of the gate
order, default all). One JSON line per query + a summary line.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif s.dtype == object:
            pdf[c] = s.map(lambda v: None if v is None else str(v))
    return pdf.sort_values(list(pdf.columns), na_position="last").reset_index(
        drop=True
    )


def main() -> None:
    from pyspark.sql import SparkSession

    tz = os.environ.get("SPARK_GRAFT_SIM_TZ", "America/New_York")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim-all")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", tz)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import importlib.util

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(here, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()
    ids = list(osql)
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(ids)
    # corpus stamp (ADVICE r9): the log must prove WHICH fixture dir it
    # ran against — a hostile-corpus sweep is otherwise byte-identical
    # to the ordinary sim. Fingerprint = per-table (size, mtime_ns).
    import hashlib

    sig = hashlib.sha256()
    for t in TABLES:
        try:
            st = os.stat(os.path.join(SF, f"{t}.parquet"))
            sig.update(f"{t}:{st.st_size}:{st.st_mtime_ns};".encode())
        except OSError:
            sig.update(f"{t}:missing;".encode())
    print(
        json.dumps(
            {
                "corpus": SF,
                "corpus_fingerprint": sig.hexdigest()[:16],
                "tz": tz,
            }
        )
    )
    con = duckdb.connect()
    # Single-threaded oracle: DuckDB v1.0.0's PARALLEL window operator is
    # nondeterministic when a window partition/order key is NULL (hostile
    # fixture, r7: NULL-key partitions randomly merge into neighbors,
    # 20/30 runs) — threads=1 removes the parallel path. The product-side
    # fix is still real (null-safe joins/sentinels in the queries); this
    # only keeps the VERIFIER deterministic.
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    n_ok = n_bad = 0
    for qid in ids[lo:hi]:
        try:
            a = _norm(qs[qid](spark, SF).toPandas())
            b = _norm(con.execute(osql[qid]).fetch_df())
            ok = bool(a.shape == b.shape and a.equals(b))
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            print(json.dumps({"q": qid, "ok": False, "err": str(e)[:200]}))
            n_bad += 1
            continue
        print(json.dumps({"q": qid, "ok": ok}))
        n_ok += ok
        n_bad += not ok
    print(json.dumps({"slice": [lo, hi], "ok": n_ok, "bad": n_bad}))


if __name__ == "__main__":
    main()
