#!/usr/bin/env python
"""Build a HOSTILE fixture dir: the sf0.001 tables plus adversarial rows.

The driver fixtures are clean — zero NULLs, zero <3-token docs, unique
keys, valid JSON, one embedding dim. Production corpora are not. This
builder appends the degenerate shapes a 100 TB web corpus actually
contains, with the original parquet schemas preserved byte-for-byte:

- documents: empty / whitespace-only / 1-2-token texts, IDENTICAL short
  docs (the ANSI 0/0 + NULL-band-skew case the r5 guard fix covers),
  exact-duplicate long docs, a near-dup triple, a 300x-repeated-token
  doc, unicode (accents/CJK/emoji), embedded newlines+tabs, doubled
  spaces (empty tokens from split), a 2000-token doc.
- embeddings: the all-zero vector (never-similar determinism rule), an
  identical pair, a near-identical neighbor, +/-1e3 and 1e-8 magnitudes,
  an exact negation (cosine -1). All dim-64.
- events: NULL user_id / value / props, '{}' and '{"k":null}' props,
  exact-timestamp ties for one user, value 0 / negative / 1e12, events
  at the exact window boundary instants.
- orders/lineitem/customer: orphan foreign keys both directions,
  customers with no orders, quantity 0, discount 1.0, price 0, negative
  acctbal, boundary order dates.
- part/supplier: size 0, price 0, negative balance. nation/region: as-is.

Every key stays unique and every (lang, source, event_type, flag) value
stays inside the fixture domain, so determinism contracts that rely on
key uniqueness or pivot/oracle value lists still hold — what's being
probed is CONTENT edges, not schema or key-integrity violations.

Usage: python tools/hostile_fixture.py [outdir]   (default /tmp/hostile_sf)
Then:  SPARK_GRAFT_SIM_SF_DIR=<outdir> python tools/driver_sim.py
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon",
]


def _doc(doc_id, text, lang="en", source="src0"):
    return {
        "doc_id": doc_id, "text": text, "lang": lang, "source": source,
        "n_chars": len(text),
    }


def _docs_rows():
    long40 = " ".join(VOCAB[i % 20] + str(i // 20) for i in range(40))
    near40 = " ".join(
        [VOCAB[i % 20] + str(i // 20) for i in range(39)] + ["mutated"]
    )
    return [
        _doc(500, ""),
        _doc(501, " "),
        _doc(502, "a", "de"),
        _doc(503, "a b", "fr"),
        _doc(504, "tiny doc", "es"),
        _doc(505, "tiny doc", "es", "src1"),
        _doc(506, long40),
        _doc(507, long40, "en", "src3"),
        _doc(508, near40),
        _doc(509, " ".join(["spam"] * 300), "en", "src4"),
        _doc(
            510,
            "héllo wörld 你好 世界 😀 emoji tëst ünïcode tokens here "
            "extra words crossing the shingle minimum easily",
            "zh",
            "src6",
        ),
        _doc(511, " ".join(VOCAB[i % 20] for i in range(2000)), "en", "src7"),
        _doc(512, "line1\nline2 tab\there third token and more words now"),
        _doc(513, "  double  spaced  text  with  empty  tokens  "),
    ]


def _emb_rows():
    base = [round(0.1 + 0.01 * d, 4) for d in range(64)]
    near = list(base)
    near[0] = round(near[0] + 0.001, 4)
    return [
        {"vec_id": 500, "embedding": [0.0] * 64, "label": 0},
        {"vec_id": 501, "embedding": base, "label": 1},
        {"vec_id": 502, "embedding": base, "label": 1},
        {"vec_id": 503, "embedding": near, "label": 2},
        {"vec_id": 504, "embedding": [1000.0] * 64, "label": 3},
        {"vec_id": 505, "embedding": [1e-8] * 64, "label": 4},
        {"vec_id": 506, "embedding": [-v for v in base], "label": 5},
    ]


def _event(eid, ts, user_id, etype, value, props):
    return {
        "event_id": eid, "ts": ts, "user_id": user_id,
        "event_type": etype, "value": value, "props": props,
    }


def _events_rows():
    t = datetime(2024, 1, 15, 12, 0, 0)
    return [
        _event(1000, t, None, "view", 1.0, '{"page": "/"}'),
        _event(1001, t, None, "click", 2.0, '{"page": "/"}'),
        _event(1002, datetime(2024, 1, 16, 8, 30, 0), None, "view", 3.0, None),
        _event(1003, datetime(2024, 1, 16, 9, 0, 0), 7, "view", None, "{}"),
        _event(1004, datetime(2024, 1, 16, 9, 5, 0), 7, "click", None, '{"k":null}'),
        # exact-timestamp ties for one user (window order-by edge)
        _event(1005, datetime(2024, 1, 17, 10, 0, 0), 42, "view", 1.0, '{"s":1}'),
        _event(1006, datetime(2024, 1, 17, 10, 0, 0), 42, "click", 2.0, '{"s":1}'),
        _event(1007, datetime(2024, 1, 17, 10, 0, 0), 42, "purchase", 3.0, '{"s":1}'),
        _event(1008, datetime(2024, 1, 18, 0, 0, 0), 43, "view", 0.0, None),
        _event(1009, datetime(2024, 1, 18, 1, 0, 0), 43, "error", -5.5, '{"e":1}'),
        _event(1010, datetime(2024, 1, 18, 2, 0, 0), 43, "purchase", 1e12, '{"amt":1}'),
        # window-boundary instants (stay inside the fixture min/max window)
        _event(1011, datetime(2024, 1, 1, 0, 10, 0), 44, "signup", 1.0, "{}"),
        _event(1012, datetime(2024, 1, 30, 23, 0, 0), 44, "view", 1.0, "{}"),
        # NULL ts (r6): clock-less / parse-failed events — every real
        # ingest stream has them; time-bucketed aggs must emit (not drop,
        # not crash on) the NULL bucket exactly like the SQL oracle does
        _event(1013, None, 45, "view", 1.0, '{"nt":1}'),
        _event(1014, None, None, "error", None, None),
        # multi-month rows (r13): SAME day-of-month as the Jan 15/16 rows
        # but in February — a day-of-month (vs date_trunc('day')) bucketing
        # bug folds Jan 15 with Feb 15 into one bar; the r12 judge caught
        # exactly that in win_ohlc_bars, and these rows keep it caught
        # (distinct values so a folded bar's open/high/low/close all shift)
        _event(1015, datetime(2024, 2, 15, 9, 0, 0), 46, "view", 7.0, "{}"),
        _event(1016, datetime(2024, 2, 15, 18, 0, 0), 46, "view", -7.0, "{}"),
        _event(1017, datetime(2024, 2, 16, 12, 0, 0), 46, "click", 9.5, None),
    ]


def _orders_rows():
    return [
        # orphan custkey (no such customer): outer/anti join probes
        {"o_orderkey": 1500, "o_custkey": 9999, "o_orderstatus": "O",
         "o_totalprice": 0.0, "o_orderdate": datetime(1995, 1, 1),
         "o_orderpriority": "5-LOW"},
        {"o_orderkey": 1501, "o_custkey": 9999, "o_orderstatus": "F",
         "o_totalprice": 123.45, "o_orderdate": datetime(2001, 8, 1),
         "o_orderpriority": "1-URGENT"},
    ]


def _lineitem_rows():
    d = datetime(1996, 6, 15)
    return [
        # lineitems of an ORPHAN order (no such o_orderkey)
        {"l_orderkey": 9998, "l_partkey": 0, "l_suppkey": 0,
         "l_linenumber": 1, "l_quantity": 0.0, "l_extendedprice": 0.0,
         "l_discount": 1.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": d},
        {"l_orderkey": 9998, "l_partkey": 9997, "l_suppkey": 0,
         "l_linenumber": 2, "l_quantity": 1.0, "l_extendedprice": 100.0,
         "l_discount": 1.0, "l_tax": 0.0, "l_returnflag": "R",
         "l_linestatus": "F", "l_shipdate": d},
        # edge numerics on an EXISTING order
        {"l_orderkey": 0, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 8, "l_quantity": 0.0, "l_extendedprice": 0.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "A",
         "l_linestatus": "F", "l_shipdate": d},
    ]


def _customer_rows():
    return [
        # customers with no orders; negative / zero balances
        {"c_custkey": 150, "c_name": "Customer#000000150",
         "c_nationkey": 0, "c_acctbal": -999.99, "c_mktsegment": "BUILDING"},
        {"c_custkey": 151, "c_name": "Customer#000000151",
         "c_nationkey": 24, "c_acctbal": 0.0, "c_mktsegment": "MACHINERY"},
    ]


def _supplier_rows():
    return [{"s_suppkey": 10, "s_name": "Supplier#000000010",
             "s_nationkey": 3, "s_acctbal": -1.0}]


def _part_rows():
    return [{"p_partkey": 200, "p_name": "zero sized part",
             "p_brand": "Brand#00", "p_type": "EDGE CASE TYPE",
             "p_size": 0, "p_retailprice": 0.0}]


EXTRA = {
    "documents": _docs_rows,
    "embeddings": _emb_rows,
    "events": _events_rows,
    "orders": _orders_rows,
    "lineitem": _lineitem_rows,
    "customer": _customer_rows,
    "supplier": _supplier_rows,
    "part": _part_rows,
}

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hostile_sf"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        orig = pq.read_table(f"{SRC}/{t}.parquet")
        rows = EXTRA.get(t, lambda: [])()
        if rows:
            extra = pa.Table.from_pylist(rows, schema=orig.schema)
            orig = pa.concat_tables([orig, extra])
        pq.write_table(orig, f"{out}/{t}.parquet")
        print(t, orig.num_rows)


if __name__ == "__main__":
    main()
