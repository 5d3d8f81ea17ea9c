#!/usr/bin/env python
"""Deep differential fuzz: run every shared-SQL case from
tests/test_differential.py (single-table, window, join, and R3 analytics
cases — identical SQL executed by Spark and DuckDB) over MANY more random
datasets than the in-suite hypothesis budget (max_examples=10-12) covers,
plus a library of deterministic adversarial datasets (all-ties, all-NULL
keys, single row, rounding-boundary floats).

The in-suite tests stay cheap; this tool is the long-haul evidence run.
Seeded numpy RNG — the seed is in every JSON line, so any mismatch is
replayable with ``--seed``.

Usage: python tools/fuzz_differential.py [N_DATASETS] [--seed S]
Appends one JSON line per (dataset, outcome-summary) to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from conftest import _normalize  # noqa: E402
from test_differential import (  # noqa: E402
    CASES,
    JOIN_CASES,
    R3_CASES,
    WINDOW_CASES,
)

SINGLE = CASES + WINDOW_CASES + R3_CASES

K_POOL = [None, "a", "b", ""]


def random_pdf(rng: np.random.Generator, max_rows: int = 60) -> pd.DataFrame:
    n = int(rng.integers(1, max_rows + 1))
    ids = rng.choice(10_000, size=n, replace=False)
    k = rng.choice(len(K_POOL), size=n)
    # bias toward heavy ties: sometimes collapse u/v to near-constant
    u_span = int(rng.choice([0, 1, 3]))
    u = rng.integers(-u_span, u_span + 1, size=n) if u_span else np.zeros(n, int)
    v = np.round(rng.uniform(-100, 100, size=n), 2)
    if rng.random() < 0.2:
        v[:] = v[0]  # all-equal v: max ties in every ORDER BY v
    return pd.DataFrame(
        {
            "id": ids.astype("int64"),
            "k": [K_POOL[i] for i in k],
            "u": u.astype("int64"),
            "v": v.astype("float64"),
        }
    )


def adversarial_pdfs() -> list[tuple[str, pd.DataFrame]]:
    mk = lambda rows: pd.DataFrame(rows, columns=["id", "k", "u", "v"])  # noqa: E731
    return [
        ("single_row", mk([(1, None, 0, 0.0)])),
        ("all_null_k", mk([(i, None, i % 3 - 1, 1.5) for i in range(8)])),
        ("all_ties", mk([(i, "a", 0, 2.0) for i in range(12)])),
        ("empty_string_vs_null", mk([(1, "", 1, 0.005), (2, None, 1, -0.005),
                                     (3, "", -1, 100.0), (4, None, -1, -100.0)])),
        ("round_half_cents", mk([(i, "b", 1, 0.125 + i) for i in range(6)])),
        ("extremes", mk([(1, "a", 3, 100.0), (2, "b", -3, -100.0),
                         (3, "", 0, 0.0), (4, None, 0, -0.0)])),
    ]


def register(spark, con, view: str, pdf: pd.DataFrame) -> None:
    sdf = spark.createDataFrame(
        [tuple(r) for r in pdf.itertuples(index=False)],
        "id long, k string, u long, v double",
    )
    # tiny frames: local[32] parallelizes createDataFrame into 32 slices,
    # which turns the theta/cross join cases into 32x32=1024-task stages —
    # coalesce so per-task overhead doesn't dominate the fuzz loop
    sdf.coalesce(2).createOrReplaceTempView(view)
    con.register(view, pdf)


def agree(spark, con, sql: str) -> bool:
    a = _normalize(spark.sql(sql).toPandas())
    b = _normalize(con.execute(sql).fetch_df())
    if a.shape != b.shape:
        return False
    a = a.astype(object).where(pd.notnull(a), None)
    b = b.astype(object).where(pd.notnull(b), None)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        return True
    except AssertionError:
        return False


def main() -> int:
    n_datasets = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 120
    seed = 20260814
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    rng = np.random.default_rng(seed)

    from bootic_stats_aggregates_spark.session import get_spark

    spark = get_spark("fuzz-differential")
    t0 = time.time()
    total = bad = 0
    failures: list[dict] = []

    datasets: list[tuple[str, pd.DataFrame, pd.DataFrame]] = []
    for name, pdf in adversarial_pdfs():
        datasets.append((name, pdf, pdf.copy()))
    for i in range(n_datasets):
        datasets.append((f"rand{i}", random_pdf(rng), random_pdf(rng)))

    for di, (name, t_pdf, s_pdf) in enumerate(datasets):
        con = duckdb.connect()
        try:
            register(spark, con, "t", t_pdf)
            register(spark, con, "s", s_pdf)
            for case, sql in SINGLE + JOIN_CASES:
                total += 1
                if not agree(spark, con, sql):
                    bad += 1
                    failures.append({"dataset": name, "case": case})
        finally:
            con.close()
        # progress heartbeat (flushed) so a killed run still leaves a
        # checkpointed tally behind
        if (di + 1) % 10 == 0 or bad:
            print(
                json.dumps(
                    {"progress": di + 1, "checks": total, "mismatches": bad}
                ),
                flush=True,
            )

    print(
        json.dumps(
            {
                "tool": "fuzz_differential",
                "seed": seed,
                "datasets": len(datasets),
                "cases": len(SINGLE + JOIN_CASES),
                "checks": total,
                "mismatches": bad,
                "failures": failures[:20],
                "wall_sec": round(time.time() - t0, 1),
            }
        )
    )
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
