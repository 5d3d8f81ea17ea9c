"""Deterministic sampling operators (training-data pipeline extensions).

A 100 TB curation pipeline samples constantly — eval slices, ablation
subsets, class-balanced downsamples — and it must do so REPRODUCIBLY:
the same row set on every run, no matter the partitioning, executor
count, or read order. Spark's ``DataFrame.sample`` is seed-stable only
per partitioning, so these operators derive membership from a hash of
the ROW KEY instead: pure map-side arithmetic, stable under any layout,
and replayable in any engine (the DuckDB oracles run the identical
formula).

Hash choice: a Knuth-style multiplicative congruential hash
``(key * 2654435761 + 1013904223) mod 1e9+7`` — identical integer
arithmetic in Spark SQL and DuckDB (both 64-bit; keys up to ~3.4e9
stay below BIGINT overflow against the 2.6e9 multiplier). A cluster
deployment at larger key ranges would swap in ``xxhash64`` (Spark-only,
one-line change) exactly like the SimHash production family
(llm/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ..registry import query

#: Multiplicative hash constants (Knuth 2654435761 = 2^32 / golden ratio).
HASH_A = 2_654_435_761
HASH_C = 1_013_904_223
HASH_P = 1_000_000_007

#: sample_hash_det keeps buckets [0, SAMPLE_PCT) of 100.
SAMPLE_PCT = 10

#: sample_stratified_cap keeps at most CAP rows per stratum.
STRATUM_CAP = 200


def hash_bucket(col: str, buckets: int = 100) -> F.Column:
    """Deterministic [0, buckets) bucket of an integer key column."""
    h = (F.col(col) * F.lit(HASH_A) + F.lit(HASH_C)) % F.lit(HASH_P)
    return (h % F.lit(buckets)).alias("bucket")


def oracle_bucket(col: str, buckets: int = 100) -> str:
    """The same bucket formula as DuckDB SQL."""
    return f"((({col} * {HASH_A} + {HASH_C}) % {HASH_P}) % {buckets})"


@query(
    "sample_hash_det",
    oracle=f"""
    -- deterministic {SAMPLE_PCT}% sample: membership is a pure function of
    -- event_id, so any engine / any partitioning yields the same rows
    SELECT event_id, event_type, user_id,
           CAST({oracle_bucket('event_id')} AS BIGINT) AS bucket
    FROM events
    WHERE {oracle_bucket('event_id')} < {SAMPLE_PCT}
    """,
)
def sample_hash_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible {pct}% sample of the event stream.

    Scale story: map-only — no shuffle, no state, embarrassingly parallel;
    the codegen'd hash filter composes with column pruning so the scan
    reads only the projected columns. Contrast with ``DataFrame.sample``,
    whose membership changes when the partitioning does.
    """
    ev = table(spark, sf_dir, "events")
    bucket = hash_bucket("event_id")
    return (
        ev.select("event_id", "event_type", "user_id", bucket.cast("long").alias("bucket"))
        .filter(F.col("bucket") < SAMPLE_PCT)
    )


@query(
    "sample_stratified_cap",
    oracle=f"""
    -- class-balanced downsample: at most {STRATUM_CAP} rows per event_type,
    -- chosen by hash order (pseudo-uniform within the stratum, deterministic)
    SELECT event_type, event_id, user_id, rk
    FROM (
      SELECT event_type, event_id, user_id,
             CAST(row_number() OVER (
               PARTITION BY event_type
               ORDER BY {oracle_bucket('event_id', 1000000007)}, event_id
             ) AS BIGINT) AS rk
      FROM events
    )
    WHERE rk <= {STRATUM_CAP}
    """,
)
def sample_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each stratum (event_type) at STRATUM_CAP rows — the
    class-balancing primitive of a training-data pipeline (downsample the
    head classes, keep the tail whole).

    Ordering by the key hash rather than the key makes the kept subset
    pseudo-uniform over the stratum instead of "the oldest N". Scale
    story: one shuffle on the stratum key; Spark's WindowGroupLimit
    pre-prunes every map partition to its local top-CAP before the
    exchange, so shuffled bytes are O(strata x CAP x partitions), not the
    input size. Skewed strata stay bounded for the same reason.
    """
    ev = table(spark, sf_dir, "events")
    h = (F.col("event_id") * F.lit(HASH_A) + F.lit(HASH_C)) % F.lit(HASH_P)
    w = Window.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        ev.select("event_type", "event_id", "user_id")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= STRATUM_CAP)
    )


@query(
    "agg_aqp_sample",
    oracle=f"""
    -- sampling-based APPROXIMATE QUERY PROCESSING: per-group SUM/COUNT
    -- estimated from the deterministic {SAMPLE_PCT}% hash sample with
    -- the Horvitz-Thompson scale-up (x{100 // SAMPLE_PCT}), side by
    -- side with the exact values and a 15% error-envelope boolean.
    -- Every number is a pure function of the rows (decimal-exact sums,
    -- hash-deterministic membership), so both engines agree bit-for-bit
    -- on estimates AND booleans.
    WITH s AS (
      SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
             {oracle_bucket('event_id')} AS b
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS exact_rows,
           round(CAST(sum(v) AS DOUBLE), 2) AS exact_sum,
           CAST({100 // SAMPLE_PCT} * count(*) FILTER (WHERE b < {SAMPLE_PCT})
                AS BIGINT) AS est_rows,
           round(CAST({100 // SAMPLE_PCT} *
                      sum(v) FILTER (WHERE b < {SAMPLE_PCT}) AS DOUBLE),
                 2) AS est_sum,
           abs({100 // SAMPLE_PCT} * count(*) FILTER (WHERE b < {SAMPLE_PCT})
               - count(*)) <= 0.15 * count(*) AS rows_within
    FROM s GROUP BY 1
    """,
)
def agg_aqp_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROXIMATE QUERY PROCESSING over the deterministic sample: the
    100 TB dashboard pattern where a 10% (or 0.1%) sample answers the
    aggregate in 1/10th (1/1000th) the scan and the consumer sees the
    estimate NEXT TO its error envelope. Membership is the same pure
    key-hash as sample_hash_det — so the estimate is reproducible
    across runs, engines, and layouts (Spark's ``TABLESAMPLE`` is not),
    and at scale the sample can be MATERIALIZED once and reused by
    every downstream approximate query. Estimator is Horvitz-Thompson
    with uniform inclusion probability (scale by 1/p); sums run through
    DECIMAL(18,2) so both engines' estimates agree bit-for-bit and the
    within-15% boolean is itself oracle-checkable rather than a
    tolerance assertion. Map-only + one hash aggregate: the sample
    filter rides the scan, no extra shuffle vs the exact aggregate it
    approximates."""
    ev = table(spark, sf_dir, "events")
    scale = 100 // SAMPLE_PCT
    h = (F.col("event_id") * F.lit(HASH_A) + F.lit(HASH_C)) % F.lit(HASH_P)
    b = h % F.lit(100)
    v = F.col("value").cast("decimal(18,2)")
    return (
        ev.select(
            "event_type",
            v.alias("v"),
            # membership marker independent of v: a sampled row with a
            # NULL value still counts toward est_rows (the oracle's
            # count(*) FILTER does — hostile-corpus NULL-value finding)
            F.when(b < SAMPLE_PCT, F.lit(1)).alias("in_s"),
            F.when(b < SAMPLE_PCT, v).alias("sv"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("exact_rows"),
            F.round(F.sum("v").cast("double"), 2).alias("exact_sum"),
            (F.lit(scale) * F.count("in_s")).cast("long").alias("est_rows"),
            F.round(
                (F.lit(scale) * F.sum("sv")).cast("double"), 2
            ).alias("est_sum"),
            (
                F.abs(F.lit(scale) * F.count("in_s") - F.count(F.lit(1)))
                <= 0.15 * F.count(F.lit(1))
            ).alias("rows_within"),
        )
    )
