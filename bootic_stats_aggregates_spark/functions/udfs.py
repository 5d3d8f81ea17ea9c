"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

The reference has no user-function surface (fixed Go code); ours exists for
the few ops built-ins can't express. Ordering of preference (SURVEY.md §2.10
and the pyspark guide): native exprs > Arrow-batched pandas UDF >
grouped-agg pandas UDF / UDTF > row-at-a-time Python UDF (last resort, no
codegen, per-row pickling).

Every query here deliberately computes something an oracle can check, so
the *machinery* (Arrow batching, grouped aggregation, lateral table
expansion, row pickling) is verified — not just the math.

UDF objects are created inside the query builders (pyspark 4 resolves the
DDL return types against the active session, so module-import-time
decorators would require a session before the driver provides one).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from ..io import table
from ..registry import query


def _poly(value: pd.Series) -> pd.Series:
    """Vectorized body: one Arrow batch in, one out (no per-row Python).
    Polynomial on purpose — bit-exact IEEE on both engines."""
    return value * value * 0.5 + value * 0.1 + 1.0


@query(
    "udf_scalar_pandas",
    oracle="""
    SELECT
      event_id,
      round(value * value * 0.5 + value * 0.1 + 1.0, 6) AS score
    FROM events
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF (SURVEY.md §2.10 udf_scalar_pandas)."""
    poly_score = pandas_udf(_poly, "double")
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.round(poly_score("value"), 6).alias("score")
    )


def _median(value: pd.Series) -> float:
    """Grouped-agg body: the whole group's column arrives as one series."""
    return float(value.median())


def _group_size(value: pd.Series) -> int:
    return int(len(value))


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT
      event_type,
      round(median(value), 4) AS median_value,
      CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via grouped-agg pandas UDF: exact per-group median.

    pandas interpolates the even-count median as (x1+x2)/2 — the same
    formula as DuckDB's quantile_cont(0.5), so the rounded values match.
    (Spark has native median(); the point is the UDAF surface — any
    per-group sketch/model fits this shape.)
    """
    from pyspark.sql.functions import PandasUDFType

    # explicit GROUPED_AGG: `from __future__ import annotations` stringifies
    # the hints, so pyspark can't infer the eval type from them. Spark
    # forbids mixing grouped-agg pandas UDFs with JVM-native aggregates in
    # one agg(), so the row count is a pandas UDAF too.
    median_agg = pandas_udf(_median, "double", PandasUDFType.GROUPED_AGG)
    size_agg = pandas_udf(_group_size, "long", PandasUDFType.GROUPED_AGG)
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(median_agg("value"), 4).alias("median_value"),
        size_agg("value").alias("n"),
    )


CHUNK_TOKENS = 10


class _ChunkDoc:
    """Python UDTF body (Spark 4): one document row in -> one row per chunk.

    The doc->chunks exploder of an LLM ingest pipeline (SURVEY.md §2.10
    udf_table); chunking policy lives in plain Python while the lateral
    join distribution is Spark's.
    """

    def eval(self, text: str):
        toks = text.split(" ")
        for i in range(0, len(toks), CHUNK_TOKENS):
            chunk = toks[i : i + CHUNK_TOKENS]
            yield i // CHUNK_TOKENS, " ".join(chunk), len(chunk)


_CHUNK_ORACLE = f"""
    SELECT
      doc_id,
      CAST(i - 1 AS INT) AS chunk_id,
      array_to_string(
        string_split(text, ' ')[(i-1)*{CHUNK_TOKENS}+1 : i*{CHUNK_TOKENS}], ' '
      ) AS chunk_text,
      CAST(least({CHUNK_TOKENS},
           len(string_split(text, ' ')) - (i-1)*{CHUNK_TOKENS}) AS INT)
        AS n_tokens
    FROM (
      SELECT doc_id, text,
             unnest(range(1, CAST(ceil(len(string_split(text, ' '))
                                       / {CHUNK_TOKENS}.0) AS BIGINT) + 1)) AS i
      FROM documents
    )
    """


@query("udf_table", oracle=_CHUNK_ORACLE)
def udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc -> fixed-size token chunks via a lateral-joined Python UDTF."""
    d = table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("_udtf_docs")
    chunker = udtf(_ChunkDoc, returnType="chunk_id int, chunk_text string, n_tokens int")
    spark.udtf.register("chunk_doc", chunker)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_tokens
        FROM _udtf_docs d, LATERAL chunk_doc(d.text) c
        """
    )


def _bucket(event_type: str, user_id: int) -> str:
    # SQL || and % NULL-propagate; a Python UDF sees None and must do the
    # same by hand or it raises TypeError on the first NULL row (hostile
    # fixture sweep finding, r5) — the perennial Python-UDF footgun.
    if event_type is None or user_id is None:
        return None
    return f"{event_type}:{user_id % 10}"


@query(
    "udf_plain",
    oracle="""
    SELECT
      event_id,
      event_type || ':' || CAST(user_id % 10 AS VARCHAR) AS bucket
    FROM events
    """,
)
def udf_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — LAST RESORT surface (no codegen, one
    Python call per row). Exists to prove the plumbing; everything in this
    expression is doable natively (see the oracle). Benchmark the others
    against this, never ship it on a hot path."""
    legacy_bucket_key = udf(_bucket, "string")
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id", legacy_bucket_key("event_type", "user_id").alias("bucket")
    )


@query("llm_chunk_native", oracle=_CHUNK_ORACLE)
def llm_chunk_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc -> fixed-size token chunks in PURE column expressions — the
    whole-stage-codegen twin of ``udf_table`` (same oracle, same output).

    transform over a per-row chunk-index sequence + slice/concat_ws: the 1:N
    fan-out never leaves the JVM. This is the shape to ship at 100 TB;
    ``udf_table`` exists for chunking policies too complex for expressions
    (bench both before choosing)."""
    # r14: split materialized in its own projection — inline, the
    # interpreted chunker lambda re-evaluates it per slice (O(L²)/doc;
    # guide §1.2, the fleet-wide split-once fix).
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("__ts")
    )
    toks = F.col("__ts")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK_TOKENS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.struct(
            c.cast("int").alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(toks, c * CHUNK_TOKENS + 1, CHUNK_TOKENS)
            ).alias("chunk_text"),
            F.least(
                F.lit(CHUNK_TOKENS), F.size(toks) - c * CHUNK_TOKENS
            ).cast("int").alias("n_tokens"),
        ),
    )
    return d.select("doc_id", F.explode(chunks).alias("ch")).select(
        "doc_id", "ch.chunk_id", "ch.chunk_text", "ch.n_tokens"
    )


#: Sliding-window chunking: window of OVERLAP_SIZE tokens advancing by
#: OVERLAP_STRIDE (overlap = SIZE - STRIDE) — the context-preserving
#: chunking used for retrieval corpora and LM pretraining windows.
OVERLAP_SIZE = 12
OVERLAP_STRIDE = 8

_CHUNK_OVERLAP_ORACLE = f"""
    SELECT
      doc_id,
      CAST(i AS INT) AS win_id,
      CAST(i * {OVERLAP_STRIDE} AS INT) AS start_tok,
      array_to_string(
        string_split(text, ' ')
          [i*{OVERLAP_STRIDE}+1 : i*{OVERLAP_STRIDE}+{OVERLAP_SIZE}], ' '
      ) AS chunk_text,
      CAST(least({OVERLAP_SIZE},
           len(string_split(text, ' ')) - i*{OVERLAP_STRIDE}) AS INT)
        AS n_tokens
    FROM (
      SELECT doc_id, text,
             unnest(range(0,
               CAST(ceil(greatest(len(string_split(text, ' '))
                                  - {OVERLAP_SIZE}, 0)
                         / {OVERLAP_STRIDE}.0) AS BIGINT) + 1)) AS i
      FROM documents
    )
    """


@query("llm_chunk_overlap", oracle=_CHUNK_OVERLAP_ORACLE)
def llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc -> OVERLAPPING token windows (size {size}, stride {stride}) in
    pure column expressions — the retrieval/pretraining chunking where
    consecutive windows share ``size - stride`` tokens so no answer span
    is ever split across a boundary. Window count is
    ``ceil(max(len - size, 0) / stride) + 1``: every token is covered,
    the final window may be short (its true length is emitted), and a
    doc shorter than one window still yields exactly one. Same 1:N
    codegen fan-out as llm_chunk_native — transform over a per-row index
    sequence + slice/concat_ws, map-only, never leaves the JVM.
    """
    # r14: split materialized in its own projection (see llm_chunk_native).
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("__ts")
    )
    toks = F.col("__ts")
    n_wins = (
        F.ceil(
            F.greatest(F.size(toks) - OVERLAP_SIZE, F.lit(0))
            / F.lit(float(OVERLAP_STRIDE))
        ).cast("int")
        + 1
    )
    wins = F.transform(
        F.sequence(F.lit(0), n_wins - 1),
        lambda i: F.struct(
            i.cast("int").alias("win_id"),
            (i * OVERLAP_STRIDE).cast("int").alias("start_tok"),
            F.concat_ws(
                " ",
                F.slice(toks, i * OVERLAP_STRIDE + 1, OVERLAP_SIZE),
            ).alias("chunk_text"),
            F.least(
                F.lit(OVERLAP_SIZE), F.size(toks) - i * OVERLAP_STRIDE
            ).cast("int").alias("n_tokens"),
        ),
    )
    return d.select("doc_id", F.explode(wins).alias("w")).select(
        "doc_id", "w.win_id", "w.start_tok", "w.chunk_text", "w.n_tokens"
    )


llm_chunk_overlap.__doc__ = llm_chunk_overlap.__doc__.format(
    size=OVERLAP_SIZE, stride=OVERLAP_STRIDE
)


@query(
    "udf_arrow_scalar",
    oracle="""
    SELECT
      event_id,
      event_type || ':' || CAST(user_id % 10 AS VARCHAR) AS bucket
    FROM events
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED Python UDF (Spark 4 ``useArrow=True``) — the
    middle rung of the Python-UDF ladder and the migration target for
    legacy ``udf_plain`` code: the function still sees one row at a time
    (no rewrite needed), but serialization crosses the JVM/Python
    boundary in Arrow record batches instead of pickled rows — measured
    here it plans as ArrowEvalPython instead of BatchEvalPython, so the
    fleet hygiene audit (no BatchEvalPython outside the declared demos)
    passes without an exemption. Same oracle as udf_plain: identical
    semantics, different wire format. Full vectorization (pandas_udf,
    udf_scalar_pandas) remains the hot-path answer.
    """
    arrow_bucket = udf(_bucket, "string", useArrow=True)
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id", arrow_bucket("event_type", "user_id").alias("bucket")
    )
