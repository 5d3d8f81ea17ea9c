"""Table loading for the driver-generated parquet fixtures (TESTDATA.md).

All reads go through :func:`table` so the whole engine benefits from the
vectorized parquet reader, predicate pushdown and column pruning (Catalyst
does both as long as we never materialize early — so no ``.cache()`` here).

100 TB notes: at cluster scale these would be partitioned tables
(``events`` partitioned by ``date(ts)``, facts bucketed by join key —
SURVEY.md §7.3); the loader keeps a single seam where that layout knowledge
would live.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import session_cache, tune

#: All driver-provided tables (FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


#: Columns stored as parquet TIMESTAMP(NANOS). How Spark surfaces them
#: depends on the minor version: with ``nanosAsLong`` honored they arrive as
#: raw epoch-ns longs; newer 4.1.x builds ignore that legacy conf and read
#: them natively as TIMESTAMP_NTZ (micros, floor-truncated — same truncation
#: DuckDB applies converting TIMESTAMP_NS->TIMESTAMP). normalize_ts() maps
#: both forms to the session-UTC TIMESTAMP the whole engine is written
#: against, so downstream code sees one type regardless of Spark build.
_NANOS_COLS = {"events": ("ts",)}


def normalize_ts(df: DataFrame, col: str) -> DataFrame:
    """Normalize a parquet TIMESTAMP(NANOS) column to plain TIMESTAMP (UTC).

    Long (legacy nanosAsLong) -> floor ns to us; TIMESTAMP_NTZ (native 4.1.x
    read) -> reinterpret as UTC instant (session timezone is pinned to UTC in
    tune(), so the wall values are identical). Idempotent on TIMESTAMP.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df

#: DataFrame handles per (live session, sf_dir, table): re-listing the file
#: and re-inferring the schema costs ~100 ms per spark.read call (measured)
#: and buys nothing — the DataFrame is an immutable lazy plan, safe to reuse.
#: Scoped via session_cache so a stopped session's plans can never leak into
#: a new session that reuses the same id() (ADVICE r1).


def _cache_tables() -> bool:
    """bench.py sets SPARK_GRAFT_CACHE_TABLES=1: pin fixture tables in the
    in-memory columnar cache. The fixtures are single-row-group parquet, so
    a cold scan is single-threaded no matter the split size; the cache is
    the warm-engine analog of the DuckDB baseline's warm buffer pool
    (BASELINE.md measures 3rd-run warm times)."""
    return os.environ.get("SPARK_GRAFT_CACHE_TABLES") == "1"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (lazy — a Catalyst relation, not data)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    cache = session_cache(spark, "tables")
    key = (os.path.normpath(sf_dir), name)
    cached = cache.get(key)
    if cached is not None:
        return cached
    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_COLS.get(name, ()):
        df = normalize_ts(df, col)
    if _cache_tables():
        # single-row-group files arrive as 1 partition; spread the cached
        # columnar blocks over a moderate partition count at fill time so
        # scans compute in parallel without per-task overhead dominating
        # (grid-searched: 16 parts x 8 shuffle is the sweet spot locally)
        nparts = int(os.environ.get("SPARK_GRAFT_CACHE_PARTS", "16"))
        df = df.repartition(nparts).cache()
    cache[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as a dict — convenience for multi-table queries."""
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` twins work."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
