#!/usr/bin/env python
"""Self-contained duplicate-code detector (pylint is not installed in this
container, so the round-5 verdict's ``pylint --enable=duplicate-code`` pass
is reproduced here from scratch).

Method: for every ``.py`` file under the package and ``tests/``, strip
comments/docstrings via ``tokenize``, normalize identifiers are KEPT (we
want to catch copy-paste, not structural similarity), shingle the token
stream into 24-token windows, and report any window shared by two
DIFFERENT files (or repeated >2x within one file) along with the source
lines. Windows made of fewer than 8 distinct tokens are ignored (import
blocks, arg lists).

Output: one JSON line per duplicated shingle cluster, then a summary.
"""

from __future__ import annotations

import io
import json
import os
import sys
import tokenize
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHINGLE = 24
MIN_DISTINCT = 8

SKIP_TOKENS = {
    tokenize.COMMENT,
    tokenize.NL,
    tokenize.NEWLINE,
    tokenize.INDENT,
    tokenize.DEDENT,
    tokenize.ENCODING,
    tokenize.ENDMARKER,
}


def token_stream(path: str):
    """(token_string, first_line) pairs with comments/docstrings removed."""
    with open(path, "rb") as fh:
        src = fh.read()
    out = []
    prev_was_suite_open = True  # module start: leading string is a docstring
    try:
        toks = list(tokenize.tokenize(io.BytesIO(src).readline))
    except tokenize.TokenError:
        return []
    for tok in toks:
        if tok.type in SKIP_TOKENS:
            if tok.type == tokenize.NEWLINE:
                prev_was_suite_open = False
            continue
        if tok.type == tokenize.STRING and prev_was_suite_open:
            # Docstring position (first statement of a suite/module): skip.
            prev_was_suite_open = False
            continue
        prev_was_suite_open = tok.type == tokenize.OP and tok.string == ":"
        out.append((tok.string, tok.start[0]))
    return out


def main() -> int:
    files = []
    for base in ("bootic_stats_aggregates_spark", "tests"):
        for dirpath, _dirs, names in os.walk(os.path.join(ROOT, base)):
            for n in sorted(names):
                if n.endswith(".py"):
                    files.append(os.path.join(dirpath, n))
    files.append(os.path.join(ROOT, "__spark_entry__.py"))
    files.append(os.path.join(ROOT, "bench.py"))

    buckets: dict[tuple, list] = defaultdict(list)
    for path in files:
        rel = os.path.relpath(path, ROOT)
        toks = token_stream(path)
        for i in range(0, max(0, len(toks) - SHINGLE + 1)):
            window = toks[i : i + SHINGLE]
            key = tuple(t for t, _ in window)
            if len(set(key)) < MIN_DISTINCT:
                continue
            buckets[key].append((rel, window[0][1]))

    # Collapse overlapping shingles: report per (file-pair, ~line-region).
    seen_regions = set()
    clusters = 0
    for key, sites in buckets.items():
        locs = sorted(set(sites))
        if len({f for f, _ in locs}) < 2 and len(locs) < 3:
            continue
        region = tuple((f, ln // 10) for f, ln in locs)
        if region in seen_regions:
            continue
        seen_regions.add(region)
        clusters += 1
        print(json.dumps({"sites": locs[:6], "tokens": " ".join(key)[:120]}))
    print(json.dumps({"files": len(files), "duplicate_clusters": clusters}))
    return 0 if clusters == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
