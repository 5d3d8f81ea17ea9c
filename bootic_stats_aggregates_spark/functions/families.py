"""Scalar function families (SURVEY.md §2.7) — one composite query each.

The reference's scalar surface is tiny (referrer/path normalization, time
bucketing, counter arithmetic, Go zero-value defaults — SURVEY.md §2.7,
reconstructed). Each query below exercises one family end-to-end through
whole-stage codegen; none of them leave the JVM.

Oracle-alignment traps handled here (probed against DuckDB 1.0 this session):
- DuckDB ``dayofweek`` is 0=Sunday vs Spark 1=Sunday -> oracle adds +1;
- DuckDB ``CAST(double AS INT)`` *rounds*, Spark truncates -> floor() first;
- DuckDB integer sums widen to HUGEINT (pandas float) -> CAST AS BIGINT;
- libm differences (log/pow) are sub-ulp -> round(…, 6) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query


@query(
    "fn_string",
    oracle="""
    SELECT
      doc_id,
      lower(lang) AS lang_l,
      upper(source) AS source_u,
      substring(text, 1, 20) AS prefix20,
      CAST(length(text) AS BIGINT) AS n_len,
      CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT) AS src_num,
      concat_ws('|', lang, source) AS lang_src,
      lpad(lang, 5, '_') AS lang_pad,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      replace(lang, 'en', 'EN') AS lang_repl
    FROM documents
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String normalization family (the referrer/UA-parsing analog)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower("lang").alias("lang_l"),
        F.upper("source").alias("source_u"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.length("text").cast("long").alias("n_len"),
        F.regexp_extract("source", r"src(\d+)", 1).cast("long").alias("src_num"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.regexp_replace("lang", "en", "EN").alias("lang_repl"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT
      o_orderkey,
      CAST(date_part('year', o_orderdate) AS BIGINT) AS y,
      CAST(date_part('month', o_orderdate) AS BIGINT) AS m,
      CAST(date_part('day', o_orderdate) AS BIGINT) AS d,
      CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
      CAST(quarter(o_orderdate) AS BIGINT) AS q,
      date_trunc('month', o_orderdate) AS month_start,
      CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
      CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
      CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
           AS BIGINT) AS days_since_epoch95,
      strftime(o_orderdate, '%Y:%m:%d') AS bucket_key
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time bucketing family — the reference's key-schema core
    (``{y}:{m}:{d}`` Redis key parts, SURVEY.md §2.7 fn_date)."""
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).cast("long").alias("y"),
        F.month(od).cast("long").alias("m"),
        F.dayofmonth(od).cast("long").alias("d"),
        F.dayofweek(od).cast("long").alias("dow"),
        F.quarter(od).cast("long").alias("q"),
        F.date_trunc("month", od).alias("month_start"),
        F.date_add(od.cast("date"), 30).cast("timestamp").alias("plus30"),
        F.last_day(od.cast("date")).cast("timestamp").alias("month_end"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch95"),
        F.date_format(od, "yyyy:MM:dd").alias("bucket_key"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      round(sqrt(l_quantity), 6) AS qty_sqrt,
      CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      round(abs(l_discount - 0.05), 6) AS disc_dev,
      CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
      round(ln(l_quantity + 1), 6) AS qty_ln,
      round(greatest(l_quantity, l_discount * 100), 6) AS g,
      round(least(l_quantity, l_tax * 100), 6) AS l
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic family (counter/rate math in the reference)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.pmod("l_orderkey", F.lit(7)).cast("long").alias("key_mod"),
        F.round(F.log(F.col("l_quantity") + 1), 6).alias("qty_ln"),
        F.round(F.greatest("l_quantity", F.col("l_discount") * 100), 6).alias("g"),
        F.round(F.least("l_quantity", F.col("l_tax") * 100), 6).alias("l"),
    )


@query(
    "fn_cond",
    oracle="""
    SELECT
      o_orderkey,
      CASE
        WHEN o_totalprice > 150000 THEN 'large'
        WHEN o_totalprice > 50000 THEN 'medium'
        ELSE 'small'
      END AS size_class,
      nullif(o_orderstatus, 'P') AS status_or_null,
      coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_filled,
      o_orderstatus = 'F' AS is_final
    FROM orders
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals family (Go zero-value defaulting analog)."""
    o = table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price > 150000, "large")
        .when(price > 50000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")
        ).alias("status_filled"),
        (F.col("o_orderstatus") == "F").alias("is_final"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT
      event_id,
      CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
      CAST(user_id AS VARCHAR) AS user_str,
      CAST(user_id AS DOUBLE) AS user_dbl,
      date_trunc('day', ts) AS day,
      CAST(floor(value) AS BIGINT) AS value_int
    FROM events
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family. double->int goes through floor(): DuckDB rounds plain
    double->INT casts while Spark truncates — floor agrees everywhere."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.col("user_id").cast("string").alias("user_str"),
        F.col("user_id").cast("double").alias("user_dbl"),
        F.date_trunc("day", "ts").alias("day"),
        F.floor("value").cast("long").alias("value_int"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT
      doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
      list_contains(string_split(text, ' '), 'spark') AS has_spark,
      CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x)))
           AS BIGINT) AS total_chars,
      list_min(string_split(text, ' ')) AS first_alpha,
      array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
        AS top3_alpha
    FROM documents
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order function family over tokenized text.

    transform/aggregate run as codegen'd lambda expressions JVM-side — the
    10-100x-cheaper alternative to a Python UDF for per-token math.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("total_chars"),
        F.array_min(toks).alias("first_alpha"),
        F.concat_ws(",", F.slice(F.sort_array(F.array_distinct(toks)), 1, 3)).alias(
            "top3_alpha"
        ),
    )


@query(
    "fn_map",
    oracle="""
    SELECT
      event_id,
      TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
      CASE WHEN json_type(props) = 'OBJECT'
           THEN CAST(len(json_keys(props)) AS BIGINT) END AS n_keys,
      CASE WHEN json_type(props) = 'OBJECT' AND len(json_keys(props)) > 0
           THEN array_to_string(json_keys(props), ',') END AS key_list
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family over the parsed JSON payload.

    Parsed as MapType<string,STRING> — lossless for any scalar VALUE inside
    a JSON OBJECT payload; a non-object payload (e.g. props = '5') parses to
    a NULL map on Spark, and the oracle mirrors that with a json_type(props)
    = 'OBJECT' guard (DuckDB's bare len(json_keys('5')) would return 0 where
    Spark yields NULL — ADVICE r5). Values are try_cast to long: with
    map<string,long>, ONE non-numeric value
    (e.g. {"page": "/"}) silently nulled the ENTIRE map in PERMISSIVE
    from_json, losing the other keys (hostile-fixture sweep finding, r5).
    key_list goes through when(n > 0): Spark's concat_ws folds a NULL or
    empty array to '' where DuckDB's array_to_string yields NULL — the
    explicit guard makes NULL-or-empty -> NULL on both engines.
    """
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    keys = F.sort_array(F.map_keys(m))
    return ev.select(
        "event_id",
        F.element_at(m, "k").try_cast("long").alias("k_val"),
        F.size(keys).cast("long").alias("n_keys"),
        F.when(F.size(keys) > 0, F.concat_ws(",", keys)).alias("key_list"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT
      event_type,
      round(CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
            / count(*), 4) AS avg_k,
      CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
           AS BIGINT) AS n_k
    FROM events
    GROUP BY event_type
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: schema-on-read extraction feeding an aggregate.

    avg is computed as exact-int-sum / count on both sides (DuckDB's avg()
    may use a different accumulation — this form is engine-stable).
    """
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.round(F.sum(k).cast("double") / F.count(F.lit(1)), 4).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.countDistinct(k).cast("long").alias("n_k"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT
      doc_id,
      md5(text) AS text_md5,
      sha256(text) AS text_sha256,
      CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS dup_count
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family (dedup keys). md5/sha256 are cross-engine-stable hex;
    xxhash64 (used in the LSH path) is Spark-only -> kept out of oracles."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text"))
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.count(F.lit(1)).over(w).cast("long").alias("dup_count"),
    )


@query(
    "fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/' || lang
               || '?doc=' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    )
    SELECT
      doc_id,
      regexp_extract(url, 'https?://([^/]+)', 1) AS host,
      regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
      regexp_extract(url, 'doc=([0-9]+)', 1) AS doc_param
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — the reference's referrer-host/path extraction
    (`[REF⟂ tracker.go]` top-referrer zsets keyed by host). The fixtures
    carry no URLs, so one is synthesized from columns; ``parse_url`` is the
    JVM-side operator under test (the oracle decomposes with regexes)."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("?doc="), F.col("doc_id").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("doc")).alias("doc_param"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT
      event_id,
      event_id & 255 AS low_byte,
      event_id | 4096 AS with_flag,
      xor(event_id, user_id) AS mixed,
      event_id << 2 AS shl2,
      event_id >> 3 AS shr3,
      CAST(bit_count(event_id) AS BIGINT) AS popcount
    FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family — flag fields, shard masks, bloom/bitmap membership
    math (the kind of key-packing the reference does in Redis key strings,
    done properly in int64)."""
    ev = table(spark, sf_dir, "events")
    e = F.col("event_id")
    return ev.select(
        "event_id",
        e.bitwiseAND(F.lit(255)).alias("low_byte"),
        e.bitwiseOR(F.lit(4096)).alias("with_flag"),
        e.bitwiseXOR(F.col("user_id")).alias("mixed"),
        F.shiftleft(e, 2).alias("shl2"),
        F.shiftright(e, 3).alias("shr3"),
        F.bit_count(e).cast("long").alias("popcount"),
    )


@query(
    "fn_trycast",
    oracle="""
    SELECT
      doc_id,
      TRY_CAST(lang AS INTEGER) AS lang_as_int,
      TRY_CAST(regexp_extract(source, 'src([0-9]+)', 1) AS BIGINT) AS src_num,
      CASE WHEN n_chars = 0 THEN NULL
           ELSE CAST(round(CAST(length(text) AS DOUBLE) / n_chars, 6) AS DOUBLE)
      END AS len_ratio,
      TRY_CAST('not a date ' || lang AS DATE) IS NULL AS bad_date_is_null
    FROM documents
    """,
)
def fn_trycast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe-coercion family: ``try_cast`` / ``try_divide`` return NULL where
    ANSI casts would kill the job — the difference between one malformed
    record and a failed 100 TB ingest. (Spark 4 runs ANSI mode by default,
    so the try_* forms are the production idiom for dirty data.)"""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.regexp_extract("source", r"src([0-9]+)", 1)
        .try_cast("long")
        .alias("src_num"),
        F.round(
            F.try_divide(F.length("text").cast("double"), F.col("n_chars")), 6
        ).alias("len_ratio"),
        F.concat(F.lit("not a date "), F.col("lang"))
        .try_cast("date")
        .isNull()
        .alias("bad_date_is_null"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT
      doc_id,
      regexp_matches(text, 'scan|join') AS mentions_ops,
      regexp_extract(text, '([a-z]+)', 1) AS first_word,
      CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
      regexp_replace(substring(text, 1, 40), '[aeiou]', '_', 'g')
        AS devoweled_head
    FROM documents
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family: match test (rlike), first-group extract,
    extract_all count, global replace — all JVM-side codegen expressions
    (the reference's Go regexp equivalents for log/path munging). DuckDB's
    regexp_replace needs the 'g' flag to match Spark's replace-all default;
    both engines use RE2-class syntax for these patterns."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("text").rlike("scan|join").alias("mentions_ops"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0))
        .cast("long")
        .alias("n_numbers"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias(
            "devoweled_head"
        ),
    )


LOCAL_TZ = "America/Santiago"  # the reference deployment's local time


@query(
    "fn_tz_bucket",
    oracle=f"""
    -- naive ts is UTC; AT TIME ZONE 'UTC' tags it, the second AT TIME ZONE
    -- converts to local wall time (DuckDB ICU == Spark from_utc_timestamp)
    SELECT
      CAST(CAST(date_trunc('day', (ts AT TIME ZONE 'UTC')
                 AT TIME ZONE '{LOCAL_TZ}') AS DATE) AS VARCHAR) AS local_day,
      CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def fn_tz_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL-time day bucketing — the reference daemon bucketed counters in
    its deployment's wall clock, not UTC, so day keys straddle UTC midnight.
    ``from_utc_timestamp`` does the conversion JVM-side; a UTC-bucketed
    count would differ for every event in the 3-4 h offset window (verified:
    the two bucketings disagree on this fixture)."""
    ev = table(spark, sf_dir, "events")
    local_day = F.to_date(F.from_utc_timestamp("ts", LOCAL_TZ))
    return ev.groupBy(local_day.cast("string").alias("local_day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )


@query(
    "fn_struct",
    oracle="""
    -- struct family: pack, dotted field access, JSON serialization
    SELECT
      event_id,
      struct_pack(uid := user_id, et := event_type).uid AS uid,
      struct_pack(uid := user_id, et := event_type).et AS et,
      to_json(struct_pack(uid := user_id, et := event_type))::VARCHAR
        AS packed_json
    FROM events
    WHERE event_id % 97 = 0
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT scalar family — pack, field access, JSON round-trip.

    Completes the nested-type function surface beside ``fn_array`` /
    ``fn_map`` / ``fn_json``: ``named_struct`` packs columns, ``getField``
    projects back out (Catalyst collapses pack->access to the raw column —
    no runtime cost), and ``to_json`` serializes with the same compact
    key-order-preserving format DuckDB's ``to_json(struct_pack(...))``
    emits (verified byte-identical on integer/string fields). All JVM
    codegen projections, map-only at any scale.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    packed = F.named_struct(
        F.lit("uid"), F.col("user_id"), F.lit("et"), F.col("event_type")
    )
    return ev.select(
        "event_id",
        packed.getField("uid").alias("uid"),
        packed.getField("et").alias("et"),
        F.to_json(packed).alias("packed_json"),
    )


@query(
    "fn_variant",
    oracle="""
    -- VARIANT-typed dynamic JSON: typed path extraction from a nested
    -- payload, replayed by DuckDB's JSON path functions
    WITH payload AS (
      SELECT event_id,
             '{"k":' || CAST(json_extract(props, '$.k') AS BIGINT)
             || ',"user":{"id":' || user_id
             || ',"vip":' || CAST(user_id % 7 = 0 AS VARCHAR)
             || '},"tags":["' || event_type || '","t'
             || CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 5
                     AS VARCHAR)
             || '"]}' AS j
      FROM events WHERE event_id % 89 = 0
    )
    SELECT event_id,
           CAST(json_extract(j, '$.k') AS BIGINT) AS k,
           CAST(json_extract(j, '$.user.id') AS BIGINT) AS uid,
           CAST(json_extract(j, '$.user.vip') AS BOOLEAN) AS vip,
           json_extract_string(j, '$.tags[1]') AS tag1,
           CAST(NULL AS BIGINT) AS wrong_type
    FROM payload
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT type (Spark 4) — schema-on-read JSON done right.

    The reference decodes dynamic JSON per event `[REF⟂ main.go]`; the
    pre-4.x Spark answers are ``get_json_object`` (re-parses the string per
    path — fn_json) or a rigid ``from_json`` schema. VARIANT parses ONCE
    into a binary-encoded tree; every ``variant_get`` path walks that
    encoding with a typed cast, ``try_variant_get`` returns NULL on type
    mismatch instead of failing the job — the right failure mode for a
    100 TB heterogeneous event corpus. The nested payload is synthesized
    deterministically from columns (fixture props are flat ``{"k": n}``)
    and DuckDB replays extraction with JSON path functions.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 89 == 0)
    k = F.get_json_object("props", "$.k").cast("long")
    j = F.concat(
        F.lit('{"k":'), k,
        F.lit(',"user":{"id":'), F.col("user_id"),
        F.lit(',"vip":'), (F.col("user_id") % 7 == 0).cast("string"),
        F.lit('},"tags":["'), F.col("event_type"),
        F.lit('","t'), (k % 5).cast("string"), F.lit('"]}'),
    )
    v = F.parse_json(j)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k"),
        F.variant_get(v, "$.user.id", "long").alias("uid"),
        F.variant_get(v, "$.user.vip", "boolean").alias("vip"),
        F.variant_get(v, "$.tags[1]", "string").alias("tag1"),
        # a tags array is not a BIGINT: try_variant_get -> NULL, job survives
        F.try_variant_get(v, "$.tags", "long").alias("wrong_type"),
    )


@query(
    "fn_xml",
    oracle="""
    -- XML ingestion: typed extraction from an XML event payload; the
    -- oracle recomputes the expected fields from the source columns
    -- (what a correct parse MUST recover), so the XML round trip itself
    -- is the thing under test
    SELECT event_id,
           user_id AS uid,
           event_type AS et,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
    WHERE event_id % 101 = 0
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML payload parsing (``from_xml``, Spark 4) — the third wire format
    beside JSON (fn_json/src_json_*) and VARIANT (fn_variant): legacy
    feeds still deliver XML, and the engine must type it without Python.
    An XML document is synthesized per event (fixtures carry none), parsed
    with an explicit schema, and the extracted fields must round-trip
    byte-exactly back to the source columns — which is exactly what the
    oracle states, no XML needed on the DuckDB side. ``from_xml`` is a
    JVM codegen expression: map-only, no shuffle, scales like any
    projection.
    """
    ev = _sampled_events(spark, sf_dir)
    xml = F.concat(
        F.lit("<event><uid>"), F.col("user_id"),
        F.lit("</uid><et>"), F.col("event_type"),
        F.lit("</et><cents>"), F.round(F.col("value") * 100).cast("long"),
        F.lit("</cents></event>"),
    )
    parsed = F.from_xml(xml, "uid BIGINT, et STRING, cents BIGINT")
    return ev.select(
        "event_id",
        parsed.getField("uid").alias("uid"),
        parsed.getField("et").alias("et"),
        parsed.getField("cents").alias("cents"),
    )


@query(
    "fn_collation",
    oracle="""
    -- collation-aware grouping: case-insensitive keys must merge under
    -- UTF8_LCASE exactly as DuckDB's lower()-normalized grouping does
    WITH mixed AS (
      SELECT CASE user_id % 3
               WHEN 0 THEN upper(event_type)
               WHEN 1 THEN event_type
               ELSE concat(upper(substr(event_type, 1, 1)),
                           substr(event_type, 2))
             END AS w
      FROM events
    )
    SELECT lower(w) AS k, CAST(count(*) AS BIGINT) AS n
    FROM mixed GROUP BY 1
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4): UTF8_LCASE makes equality,
    grouping, and joins case-insensitive WITHOUT rewriting every
    expression through lower() — the collation rides on the type, so the
    hash aggregate's keys compare case-insensitively natively. A
    mixed-case key column is synthesized deterministically (upper /
    as-is / initcap by user id), grouped under the collation, and the
    output key is canonicalized to lower() only for the oracle hash
    (which representative casing survives a distributed agg is
    partition-order-dependent by design).
    """
    ev = table(spark, sf_dir, "events")
    w = (
        F.when(F.col("user_id") % 3 == 0, F.upper("event_type"))
        .when(F.col("user_id") % 3 == 1, F.col("event_type"))
        .otherwise(F.initcap("event_type"))
    )
    return (
        ev.select(F.collate(w, "UTF8_LCASE").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lower("w").alias("k"), "n")
    )


_I64_MAX = 9_223_372_036_854_775_807


@query(
    "fn_try_arith",
    oracle=f"""
    -- ANSI-safe arithmetic: overflow / zero-division yield NULL (not a
    -- failed job). The oracle states the expected outcomes with guarded
    -- CASE arms so DuckDB never evaluates the overflowing branch.
    WITH src AS (
      SELECT event_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             user_id % 100 AS m
      FROM events WHERE event_id % 103 = 0
    )
    SELECT event_id,
           CASE WHEN k <= m THEN {_I64_MAX} - m + k END AS sum_or_null,
           CASE WHEN k % 7 <> 0 THEN
             round(CAST(m AS DOUBLE) / (k % 7), 6) END AS div_or_null,
           -- exact try_multiply replay: product in HUGEINT, NULL iff the
           -- result leaves the BIGINT range (a k<=1 guard is NOT the
           -- boundary — for even m, (({_I64_MAX}-m)//2+1)*2 fits)
           TRY_CAST(CAST(({_I64_MAX} - m) // 2 + 1 AS HUGEINT) * k
                    AS BIGINT) AS prod_or_null
    FROM src
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic family (``try_add`` / ``try_divide`` /
    ``try_multiply``): under Spark 4's default ANSI mode, overflow and
    zero-division THROW — correct for catching bugs, fatal for a 100 TB
    job where one poisoned row kills the stage hours in. The try_*
    family localizes the failure to a NULL the pipeline can quarantine.
    Overflow cases are synthesized deterministically near INT64_MAX
    (``try_add`` overflows when the payload k exceeds the headroom m;
    ``try_multiply`` overflows for any k > 1), division by ``k % 7``
    exercises the zero path. Map-only codegen projections.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 103 == 0)
    k = F.get_json_object("props", "$.k").cast("long")
    m = F.col("user_id") % 100
    near_max = F.lit(_I64_MAX) - m
    return ev.select(
        "event_id",
        F.try_add(near_max, k).alias("sum_or_null"),
        F.round(F.try_divide(m.cast("double"), (k % 7)), 6).alias(
            "div_or_null"
        ),
        # `div` is exact 64-bit integer division; `near_max / 2` would go
        # through double precision and round 2^63-1-m up to 2^63 for small m
        # (ADVICE r3 high: 9 mismatching k=1 rows at sf0.1).
        F.try_multiply(
            F.expr(f"({_I64_MAX}L - user_id % 100) div 2") + 1, k
        ).alias("prod_or_null"),
    )


@query(
    "fn_binary_codec",
    oracle="""
    -- binary codec family: hex / base64 round trips over real payload
    -- bytes; decode(unhex(hex(x))) must be the identity
    SELECT event_id,
           hex(CAST(event_type AS BLOB)) AS type_hex,
           base64(CAST(event_type AS BLOB)) AS type_b64,
           CAST(unhex(hex(CAST(event_type AS BLOB))) AS VARCHAR)
             AS roundtrip,
           CAST(octet_length(CAST(props AS BLOB)) AS BIGINT) AS props_bytes
    FROM events
    WHERE event_id % 107 = 0
    """,
)
def fn_binary_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec family (hex / base64 / round-trip identity) — the
    wire-format plumbing for binary payload columns: content digests ship
    as hex, blobs cross JSON boundaries as base64, and
    ``decode(unhex(hex(x)))`` must be the identity or the multimodal
    pipeline corrupts payloads silently. All JVM codegen expressions over
    BINARY; DuckDB replays with its own hex/base64 over BLOB casts
    (byte-identical for the ASCII fixture strings). Map-only at any
    scale.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 107 == 0)
    b = F.encode("event_type", "utf-8")
    return ev.select(
        "event_id",
        F.hex(b).alias("type_hex"),
        F.base64(b).alias("type_b64"),
        F.decode(F.unhex(F.hex(b)), "utf-8").alias("roundtrip"),
        F.octet_length("props").cast("long").alias("props_bytes"),
    )


@query(
    "fn_levenshtein",
    oracle="""
    -- edit-distance fuzzy matching: every nation name against every
    -- region name (bounded dim x dim), distance and a near-match flag
    SELECT n.n_name, r.r_name,
           CAST(levenshtein(n.n_name, r.r_name) AS BIGINT) AS dist,
           levenshtein(n.n_name, r.r_name)
             <= greatest(length(n.n_name), length(r.r_name)) / 2
             AS near_match
    FROM nation n CROSS JOIN region r
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance (Levenshtein) fuzzy matching — the string-similarity
    primitive behind entity resolution and typo-tolerant joins, JVM-side
    (no Python). Exercised as a bounded dim×dim comparison (25×5 pairs);
    the 100 TB discipline is the same as every similarity op here: NEVER
    all-pairs on large sides — block first (prefix/phonetic/q-gram
    buckets, the same shape as the LSH band joins), pay edit distance
    only inside blocks. The near-match flag uses a length-relative
    threshold so it scales with token size.
    """
    n = table(spark, sf_dir, "nation").select("n_name")
    r = table(spark, sf_dir, "region").select("r_name")
    dist = F.levenshtein("n_name", "r_name")
    return n.crossJoin(F.broadcast(r)).select(
        "n_name",
        "r_name",
        dist.cast("long").alias("dist"),
        (
            dist
            <= F.floor(
                F.greatest(F.length("n_name"), F.length("r_name")) / 2
            )
        ).alias("near_match"),
    )


@query(
    "fn_date_arith",
    oracle="""
    -- calendar arithmetic family over real order dates; every computed
    -- date travels as a 'yyyy-mm-dd' string so DATE-type physical
    -- encodings can never leak into the comparison
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE)::VARCHAR
             AS d_plus_90,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)::VARCHAR
             AS m_plus_2,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom,
           CAST(CAST(o_orderdate AS DATE)
                + CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                            ELSE (8 - isodow(o_orderdate)) % 7 END
                       AS INT) AS VARCHAR) AS next_mon,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2026-01-01') AS BIGINT) AS days_left,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow
    FROM orders WHERE o_orderkey % 53 = 0
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic family — the scheduling/rollover math every
    reporting pipeline leans on: day offsets, END-OF-MONTH-CLAMPED month
    adds (Jan 31 + 1 month = Feb 29, both engines clamp), last_day,
    next-weekday (Spark ``next_day`` is STRICTLY after — a Monday rolls
    to the following Monday; the oracle replays that with isodow
    arithmetic), day-count to a horizon, and the ISO week/quarter/
    weekday fields. Every derived date is emitted as a plain
    'yyyy-mm-dd' string so the comparison tests calendar SEMANTICS, not
    date encodings. Map-only codegen projections at any scale.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 53 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("string").alias("d"),
        F.date_add(d, 90).cast("string").alias("d_plus_90"),
        F.add_months(d, 2).cast("string").alias("m_plus_2"),
        F.last_day(d).cast("string").alias("eom"),
        F.next_day(d, "MON").cast("string").alias("next_mon"),
        F.datediff(F.lit("2026-01-01").cast("date"), d)
        .cast("long")
        .alias("days_left"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.quarter(d).cast("long").alias("qtr"),
        (F.weekday(d) + 1).cast("long").alias("iso_dow"),
    )


def _sampled_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-in-101 deterministic events slice (``event_id % 101 = 0``) — the
    shared fixture of the XML/AES function-family demos. Modulus
    filtering (not ``sample()``) keeps the slice replayable across
    engines; the predicate pushes down to the parquet scan."""
    return table(spark, sf_dir, "events").filter(F.col("event_id") % 101 == 0)


def _aes_test_key() -> str:
    """OBVIOUSLY-INSECURE fixture key, derived at runtime so no literal
    key string ships in source (ADVICE r4: a hardcoded key trips secret
    scanners and invites cargo-culting). A REAL deployment injects the
    key from a secret manager per job; a deterministic derivation is fine
    for verifying cipher plumbing on synthetic fixture data — and ONLY
    for that."""
    import hashlib

    return hashlib.sha256(b"bootic-fixture-INSECURE-test-key").hexdigest()[:16]


#: Fixed 12-byte GCM IV (hex) for the deterministic TEST configuration.
#: NEVER reuse a fixed IV with one key in production — GCM's security
#: collapses under IV reuse; production generates a random IV per record
#: (Spark's default when no iv argument is passed) and stores it alongside.
_AES_GCM_TEST_IV_HEX = "000102030405060708090a0b"


@query(
    "fn_aes_roundtrip",
    oracle="""
    -- DuckDB has no AES builtin, so the oracle verifies the claims the
    -- cipher must satisfy rather than the ciphertext: exact round-trip
    -- identity, and the deterministic ECB ciphertext length (whole
    -- 16-byte blocks, PKCS#5: one extra block when len % 16 = 0)
    SELECT event_id,
           event_type || '/' || CAST(user_id AS VARCHAR) AS plain,
           event_type || '/' || CAST(user_id AS VARCHAR) AS decrypted,
           TRUE AS roundtrip_ok,
           CAST((strlen(event_type || '/' || CAST(user_id AS VARCHAR))
                 // 16 + 1) * 16 AS BIGINT) AS cipher_bytes
    FROM events WHERE event_id % 101 = 0
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-rest column encryption (``aes_encrypt``/``aes_decrypt``) — the
    PII-column discipline between llm_pii_redact (destroy) and plain
    storage (leak): encrypt the sensitive column before the write, carry
    ciphertext through the pipeline, decrypt at the authorized edge.

    NEVER SHIP ECB. It is used in this registered form only because the
    op's contract is cross-engine replay determinism and ECB is the one
    mode with no IV; equal plaintexts produce equal ciphertexts, which
    leaks equality structure. The production-shaped registered variant is
    ``fn_aes_gcm`` (authenticated GCM; fixed IV only under test) — use
    that as the template. Cross-library check: tests/test_differential.py
    verifies this ciphertext byte-for-byte against the ``cryptography``
    package's AES-ECB. The oracle cannot run AES, so it pins the
    falsifiable claims: decrypt(encrypt(x)) == x exactly, and the PKCS#5
    padded length law — both computed from the plaintext alone. Map-only
    codegen projections.
    """
    ev = _sampled_events(spark, sf_dir)
    plain = F.concat_ws("/", "event_type", F.col("user_id").cast("string"))
    key = F.lit(_aes_test_key())
    enc = F.aes_encrypt(plain, key, F.lit("ECB"))
    dec = F.aes_decrypt(F.unbase64(F.base64(enc)), key, F.lit("ECB")).cast(
        "string"
    )
    return ev.select(
        "event_id",
        plain.alias("plain"),
        dec.alias("decrypted"),
        (dec == plain).alias("roundtrip_ok"),
        F.octet_length(enc).cast("long").alias("cipher_bytes"),
    )


@query(
    "fn_aes_gcm",
    oracle="""
    -- the oracle cannot run AES; it pins the GCM frame laws computed from
    -- the plaintext alone: round-trip identity and the exact output size
    -- of Spark's GCM framing (12-byte IV prefix + ciphertext, which for
    -- GCM equals the plaintext length, + 16-byte auth tag = len + 28)
    SELECT event_id,
           event_type || '/' || CAST(user_id AS VARCHAR) AS plain,
           event_type || '/' || CAST(user_id AS VARCHAR) AS decrypted,
           TRUE AS roundtrip_ok,
           CAST(strlen(event_type || '/' || CAST(user_id AS VARCHAR)) + 28
                AS BIGINT) AS cipher_bytes
    FROM events WHERE event_id % 101 = 0
    """,
)
def fn_aes_gcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authenticated at-rest encryption, the PRODUCTION mode: AES-GCM
    (confidentiality + integrity tag; tampered ciphertext fails decrypt
    instead of returning garbage). Determinism for the replay oracle
    comes from injecting a fixed IV through ``aes_encrypt``'s iv
    argument — a TEST-ONLY configuration (see _AES_GCM_TEST_IV_HEX: IV
    reuse breaks GCM); production omits the argument and Spark draws a
    random IV per value, prepending it to the output exactly as replayed
    here. Cross-library: tests/test_differential.py checks the ciphertext
    + tag byte-for-byte against the ``cryptography`` package's AESGCM.
    Map-only codegen projections at any scale.
    """
    ev = _sampled_events(spark, sf_dir)
    plain = F.concat_ws("/", "event_type", F.col("user_id").cast("string"))
    key = F.lit(_aes_test_key())
    iv = F.to_binary(F.lit(_AES_GCM_TEST_IV_HEX), F.lit("hex"))
    enc = F.aes_encrypt(plain, key, F.lit("GCM"), F.lit("DEFAULT"), iv)
    dec = F.aes_decrypt(enc, key, F.lit("GCM")).cast("string")
    return ev.select(
        "event_id",
        plain.alias("plain"),
        dec.alias("decrypted"),
        (dec == plain).alias("roundtrip_ok"),
        F.octet_length(enc).cast("long").alias("cipher_bytes"),
    )
