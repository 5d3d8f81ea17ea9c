"""Sources (SURVEY.md §2.1): parquet scan + JSON payload decode.

The reference ingests a ZMQ stream of JSON events and decodes each payload
with ``encoding/json`` (SURVEY.md §2.1 ``[REF⟂ main.go]`` — reconstructed;
/root/reference was empty, SURVEY.md §0). Here the batch twin is a columnar
parquet scan; JSON payload decoding is ``get_json_object``/``from_json`` —
JVM-side expressions that stay inside whole-stage codegen (no Python).

Scale: the scan is the single most important operator at 100 TB — it must
push filters + prune columns. ``src_parquet_scan`` deliberately projects two
columns of a wide table so `.explain` shows ReadSchema with only those
columns; tests/test_plans.py asserts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query


@query(
    "src_parquet_scan",
    oracle="""
    SELECT
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(min(l_orderkey) AS BIGINT) AS min_key,
      CAST(max(l_orderkey) AS BIGINT) AS max_key,
      CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem
    """,
)
def src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch scan: only l_orderkey/l_partkey are read (column pruning)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("l_orderkey").cast("long").alias("min_key"),
        F.max("l_orderkey").cast("long").alias("max_key"),
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
    )


@query(
    "src_json_decode",
    oracle="""
    SELECT
      CAST(json_extract(props, '$.k') AS BIGINT) AS k,
      CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1
    """,
)
def src_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the dynamic JSON payload (reference: per-event json.Unmarshal).

    ``get_json_object`` runs JVM-side per row — schema-on-read like the
    reference, but vectorized and codegen'd.
    """
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long").alias("k")
    return ev.select(k).groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))


@query(
    "src_json_lines",
    oracle="""
    SELECT event_id, event_type, CAST(n AS BIGINT) AS n
    FROM (
      SELECT event_id, event_type, count(*) AS n
      FROM events
      WHERE event_id < 1000
      GROUP BY event_id, event_type
    )
    """,
)
def src_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingestion — the reference's wire format (one JSON event
    per ZMQ frame) as a batch source.

    The fixture slice is staged to JSONL once, then read back with an
    EXPLICIT schema: at 100 TB, schema inference means reading everything
    twice, so production JSON sources always declare their schema (and
    unparseable rows go to the PERMISSIVE-mode corrupt-record column
    instead of failing the job). Round-trip is verified against the
    parquet truth.
    """
    import os
    import shutil
    import uuid

    from ..layout import _LAYOUT_ROOT, _fingerprint
    from ..session import tune

    tune(spark)
    # fingerprint + atomic publish: same staleness/race discipline as the
    # layout materializations (ADVICE r1)
    out = os.path.join(
        _LAYOUT_ROOT,
        "jsonl",
        os.path.basename(os.path.normpath(sf_dir)),
        f"events-{_fingerprint(sf_dir, 'events')}",
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        tmp = f"{out}.tmp-{uuid.uuid4().hex}"
        (
            table(spark, sf_dir, "events")
            .filter(F.col("event_id") < 1000)
            .select("event_id", "event_type")
            .write.mode("overwrite")
            .json(tmp)
        )
        try:
            os.rename(tmp, out)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    schema = "event_id LONG, event_type STRING, _corrupt_record STRING"
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return (
        parsed.filter(F.col("_corrupt_record").isNull())
        .groupBy("event_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
