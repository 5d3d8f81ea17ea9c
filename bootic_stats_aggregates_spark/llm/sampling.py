"""Dataset splitting and sequence packing (training-data pipeline ops).

Two operators every LLM pretraining pipeline runs just before the
trainer sees data:

* ``llm_split_hash`` — deterministic train/val/test assignment. Split
  membership must be a pure function of the document key (never
  ``rand()``): re-runs, backfills, and incremental appends all have to
  land every doc in the same split or the eval set silently leaks into
  training.
* ``llm_pack_sequences`` — concat-and-chunk packing: documents are
  concatenated in a canonical order and cut into fixed token-budget
  sequences; ``seq_id = floor(prefix_tokens / budget)`` assigns each doc
  the sequence where it STARTS. This is the standard pretraining packing
  shape (docs may straddle a boundary; the trainer's chunker handles the
  tail tokens) expressed as one window prefix-sum — no Python, no
  iteration.

Both use the same cross-engine multiplicative hash as
``operators/sampling.py`` and whitespace tokenization consistent with
``llm/text.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ..operators.sampling import HASH_A, HASH_C, HASH_P, oracle_bucket
from ..registry import query

#: train/val/test percentage boundaries over the 100-bucket key hash.
TRAIN_PCT, VAL_PCT = 80, 10

#: tokens per packed training sequence.
PACK_BUDGET = 2048

#: whitespace token count — Spark + DuckDB twins (empty tokens dropped, so
#: runs of spaces never inflate the count).
_TOK_SPARK = "size(filter(split(text, ' '), t -> length(t) > 0))"
_TOK_DUCK = "len(list_filter(string_split(text, ' '), t -> length(t) > 0))"


@query(
    "llm_split_hash",
    oracle=f"""
    -- doc-level split assignment: pure function of doc_id, so any engine,
    -- run, or partitioning assigns identically ({TRAIN_PCT}/{VAL_PCT}/
    -- {100 - TRAIN_PCT - VAL_PCT})
    SELECT doc_id, lang,
           CASE
             WHEN {oracle_bucket('doc_id')} < {TRAIN_PCT} THEN 'train'
             WHEN {oracle_bucket('doc_id')} < {TRAIN_PCT + VAL_PCT} THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def llm_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split of the document corpus.

    Scale story: map-only projection — no shuffle, no sort, no state; an
    incremental append assigns new docs without touching old ones, and the
    assignment survives any repartitioning (unlike ``randomSplit``, whose
    membership depends on partition layout and seed plumbing).
    """
    d = table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(HASH_A) + F.lit(HASH_C)) % F.lit(HASH_P) % 100
    return d.select(
        "doc_id",
        "lang",
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "llm_pack_sequences",
    oracle=f"""
    -- concat-and-chunk packing replay: prefix token sums per lang in
    -- doc_id order; a doc belongs to the sequence where it starts
    WITH toks AS (
      SELECT lang, doc_id, {_TOK_DUCK} AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST((sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_id
      FROM toks
    )
    SELECT lang, seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM packed
    GROUP BY lang, seq_id
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into {budget}-token training sequences per language.

    ``seq_id = floor(prefix_tokens / budget)`` over (lang, doc_id order):
    one window prefix-sum, one aggregation — both JVM codegen. Scale
    story: the window partitions by ``lang``; at 100 TB the partition key
    gains a shard component (e.g. ``(lang, pmod(xxhash64(doc_id), 1024))``)
    so no single executor owns a whole language — packing within a shard
    is the industry-standard relaxation (order only matters within the
    stream a trainer reads). The aggregation reuses the window's
    partitioning, so the second shuffle moves only group rows.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", "doc_id", F.expr(_TOK_SPARK).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer `div`, not float `/`: prefix sums at 100 TB exceed 2^53 and
    # would silently lose precision through a double
    packed = toks.withColumn(
        "prefix", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn("seq_id", F.expr(f"prefix div {PACK_BUDGET}").cast("long"))
    return packed.groupBy("lang", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


#: Target sampling rate per language, in 1000ths (dataset-mixing weights:
#: upweight head language, downsample the rest — values are illustrative;
#: a real mix is tuned against the token budget). Literal constants so both
#: engines compute membership from the same numbers.
MIX_RATES_PCT10 = {"en": 1000, "fr": 500, "es": 500, "zh": 250, "de": 250}
_MIX_DEFAULT = 100  # unknown languages: keep 10%


def _mix_case_sql() -> str:
    arms = "\n             ".join(
        f"WHEN '{lang}' THEN {r}" for lang, r in sorted(MIX_RATES_PCT10.items())
    )
    return f"CASE lang {arms}\n             ELSE {_MIX_DEFAULT} END"


@query(
    "llm_mix_weights",
    oracle=f"""
    -- dataset-mixing downsample: deterministic per-language keep rates
    WITH decided AS (
      SELECT lang,
             ({oracle_bucket('doc_id', 1000)}) < ({_mix_case_sql()}) AS keep
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
           round(CAST(count(*) FILTER (WHERE keep) AS DOUBLE)
                 / count(*), 4) AS kept_ratio
    FROM decided
    GROUP BY lang
    """,
)
def llm_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixing downsampler — per-language keep rates, reproducibly.

    Pretraining mixes re-weight sources (upsample head language, damp the
    tail) by SAMPLING, and the sample must be a pure function of the doc
    key: re-runs and incremental appends must keep exactly the same docs
    or the mix drifts between pipeline runs. Membership is the shared
    multiplicative key hash against a per-language threshold — a map-only
    projection (no shuffle for the decision; one hash agg to report), so
    at 100 TB the mix pass is a streaming filter. The realized ratios ride
    along and land within ~1/sqrt(n) of the targets (pseudo-uniform hash),
    which the oracle checks exactly, not statistically.
    """
    d = table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(HASH_A) + F.lit(HASH_C)) % F.lit(
        HASH_P
    ) % 1000
    rate = F.lit(_MIX_DEFAULT)
    for lang, r in MIX_RATES_PCT10.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    keep = bucket < rate
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_if(keep).cast("long").alias("n_kept"),
        F.round(F.count_if(keep).cast("double") / F.count(F.lit(1)), 4).alias(
            "kept_ratio"
        ),
    )


SHUFFLE_SHARD_DOCS = 256  # docs per training shard after the global shuffle
_SHUF_BUCKETS = 1024  # hash-range buckets for the two-phase distributed rank

_SHUF_ORDER = f"(doc_id * {HASH_A} + {HASH_C}) % {HASH_P}"


@query(
    "llm_corpus_shuffle",
    oracle=f"""
    -- deterministic corpus shuffle: training order is a pure function of
    -- the key hash, so every re-run (and both engines) shuffles alike
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY {_SHUF_ORDER}, doc_id)
                AS BIGINT) AS shuffle_rank,
           CAST((row_number() OVER (ORDER BY {_SHUF_ORDER}, doc_id) - 1)
                // {SHUFFLE_SHARD_DOCS} AS BIGINT) AS shard_id
    FROM documents
    """,
)
def llm_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment — the pretraining
    step after packing: training order must be random-looking but a PURE
    FUNCTION of the doc key (re-runs, resumed jobs, and multi-worker
    loaders must all see the same order; ``rand()`` would reshuffle every
    run). Order = multiplicative key hash with doc_id tie-break; shard =
    rank div SHUFFLE_SHARD_DOCS (floor division on BOTH engines — DuckDB's
    ``/`` on integers is float division and its BIGINT cast rounds, so the
    oracle uses ``//``).

    Global rank WITHOUT a global window: a naive
    ``row_number() OVER (ORDER BY h)`` drags every row through ONE
    partition — the classic scale killer. Instead the rank is two-phase:
    (1) range-bucket the hash space (``h div bucket_width`` preserves
    order across buckets), (2) per-bucket ``row_number`` — distributed,
    each bucket a partition — plus each bucket's start offset from a
    {_SHUF_BUCKETS}-row prefix-sum joined back by bucket. Same answer,
    no single-partition stage; the oracle replays the naive global
    ordering and must agree exactly.
    """
    d = table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(HASH_A) + F.lit(HASH_C)) % F.lit(HASH_P)
    width = HASH_P // _SHUF_BUCKETS + 1
    hb = F.floor(h / F.lit(width)).alias("hb")
    keyed = d.select("doc_id", h.alias("h"), hb)
    counts = keyed.groupBy("hb").agg(F.count(F.lit(1)).alias("c"))
    # prefix sum over the tiny bucket table (bounded rows; single
    # partition here is fine and stays fine at any corpus size)
    off_w = Window.orderBy("hb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "hb", F.coalesce(F.sum("c").over(off_w), F.lit(0)).alias("off")
    )
    intra_w = Window.partitionBy("hb").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    rank = (F.col("off") + F.row_number().over(intra_w)).cast("long")
    return (
        keyed.join(F.broadcast(offsets), "hb")
        .select(
            "doc_id",
            rank.alias("shuffle_rank"),
            F.floor((rank - 1) / SHUFFLE_SHARD_DOCS).cast("long").alias("shard_id"),
        )
    )


#: per-band keep percentages for quality-weighted sampling.
QS_HIGH_CUT, QS_MID_CUT = 0.8, 0.5
QS_MID_PCT, QS_LOW_PCT = 50, 10

#: the llm_quality_score heuristic, restated once per engine (the band
#: thresholds must bucket IDENTICAL scores on both sides).
_Q_SPARK_STOP = "array('a','the','of','to','and','in','is','it')"
_Q_DUCK_STOP = "['a','the','of','to','and','in','is','it']"


@query(
    "llm_quality_sample",
    oracle=f"""
    -- quality-weighted deterministic sampling: high-quality docs all
    -- kept, mid kept at {QS_MID_PCT}%, low at {QS_LOW_PCT}% — membership
    -- a pure hash of doc_id within each band (reproducible under any
    -- partitioning, append-stable, replayable cross-engine)
    WITH scored AS (
      SELECT doc_id, lang,
        round(
          0.4 * least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
          + 0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0,
                        1.0)
          + 0.3 * (1.0 - CAST(len(list_intersect(
                     list_distinct(string_split(text, ' ')), {_Q_DUCK_STOP}))
                     AS DOUBLE)
                   / len(list_distinct(string_split(text, ' ')))),
          6) AS quality,
        CAST({oracle_bucket('doc_id')} AS BIGINT) AS bucket
      FROM documents
    )
    SELECT doc_id, lang, quality, bucket,
           CASE WHEN quality >= {QS_HIGH_CUT} THEN 'high'
                WHEN quality >= {QS_MID_CUT} THEN 'mid'
                ELSE 'low' END AS band
    FROM scored
    WHERE (quality >= {QS_HIGH_CUT})
       OR (quality >= {QS_MID_CUT} AND bucket < {QS_MID_PCT})
       OR (quality < {QS_MID_CUT} AND bucket < {QS_LOW_PCT})
    """,
)
def llm_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling — the curation move between "keep
    everything above a cutoff" (llm_quality_filter) and "uniform N%"
    (sample_hash_det): keep ALL high-quality docs, thin the middle band
    to {QS_MID_PCT}%, keep a {QS_LOW_PCT}% floor of the low band (low-
    quality text still contributes robustness; dropping it entirely
    shifts the training distribution). Membership composes the
    llm_quality_score heuristic with the cross-engine key hash, so the
    kept set is a pure function of (text, doc_id): append-stable,
    partition-independent, re-run-identical. Map-only at any scale —
    score, hash, and band are all codegen projections; no shuffle.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    uniq = F.array_distinct(toks)
    stop = F.expr(_Q_SPARK_STOP)
    quality = F.round(
        0.4 * F.least(F.col("n_chars").cast("double") / 500.0, F.lit(1.0))
        + 0.3 * F.least(F.size(toks).cast("double") / 50.0, F.lit(1.0))
        + 0.3
        * (
            F.lit(1.0)
            - F.size(F.array_intersect(uniq, stop)).cast("double")
            / F.size(uniq)
        ),
        6,
    )
    bucket = (
        (F.col("doc_id") * F.lit(HASH_A) + F.lit(HASH_C)) % F.lit(HASH_P)
    ) % F.lit(100)
    scored = d.select(
        "doc_id",
        "lang",
        quality.alias("quality"),
        bucket.cast("long").alias("bucket"),
    )
    keep = (
        (F.col("quality") >= QS_HIGH_CUT)
        | ((F.col("quality") >= QS_MID_CUT) & (F.col("bucket") < QS_MID_PCT))
        | ((F.col("quality") < QS_MID_CUT) & (F.col("bucket") < QS_LOW_PCT))
    )
    band = (
        F.when(F.col("quality") >= QS_HIGH_CUT, "high")
        .when(F.col("quality") >= QS_MID_CUT, "mid")
        .otherwise("low")
    )
    return scored.filter(keep).select(
        "doc_id", "lang", "quality", "bucket", band.alias("band")
    )
