"""D-series graded queries — the scalar function library (SURVEY.md §2.D).

One graded "sampler" query per function family; each exercises several
functions of the family in one pass so the inventory stays reviewable.
Engine-specific functions with no cross-engine twin (xxhash64, crc32,
bround, spark ``hash``) are grouped in a deliberately rows-only sampler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded


def _sjoin(col, sep: str = ":"):
    """Stringify an array output column for the driver's hash gate.

    The driver canonicalizer sorts the pandas result frame before hashing
    and crashes on ndarray cells (``TypeError: unhashable type:
    'numpy.ndarray'`` — CORRECTNESS_r04 ``func_array4``), so graded queries
    must never emit raw ``array<…>`` columns.  Elements are cast to string
    first so the same helper covers numeric and string arrays; the DuckDB
    twin is ``array_to_string(list_transform(L, x -> CAST(x AS VARCHAR)),
    sep)``.
    """
    return F.array_join(F.transform(col, lambda v: v.cast("string")), sep)


# ---------------------------------------------------------------------------
# D1 — string functions
# ---------------------------------------------------------------------------


@graded(
    "func_string",
    oracle=r"""
        SELECT p_partkey,
               upper(p_name) AS up_name,
               length(p_name) AS name_len,
               substring(p_name, 1, 4) AS pre4,
               concat_ws('|', p_brand, p_type) AS brand_type,
               lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
               regexp_extract(p_name, '^(\w+)', 1) AS first_word,
               translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
               levenshtein(p_name, 'cold widget') AS lev_cold,
               instr(p_name, 'old') AS pos_old,
               reverse(p_name) AS rev_name,
               trim(concat('  ', p_brand, '  ')) AS trimmed
        FROM part WHERE p_partkey < 300
    """,
    section="D1",
    description="string family: case, slice, pad, regex, translate, levenshtein…",
)
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.upper("p_name").alias("up_name"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_name", 1, 4).alias("pre4"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_pad"),
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
            F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
            F.levenshtein("p_name", F.lit("cold widget")).cast("long").alias("lev_cold"),
            F.instr("p_name", "old").cast("long").alias("pos_old"),
            F.reverse("p_name").alias("rev_name"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
                "trimmed"
            ),
        )
    )


# ---------------------------------------------------------------------------
# D2 — date/time functions (outputs canonicalized to strings/ints)
# ---------------------------------------------------------------------------


@graded(
    "func_datetime",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS yr,
               month(o_orderdate) AS mo,
               day(o_orderdate) AS dy,
               quarter(o_orderdate) AS qtr,
               dayofweek(o_orderdate) + 1 AS dow,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
               strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
               date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
        FROM orders WHERE o_orderkey < 1000
    """,
    section="D2",
    description="date/time family: parts, trunc, last_day, add_months, datediff "
    "(Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday → +1)",
)
def func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.dayofmonth("o_orderdate").cast("long").alias("dy"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.dayofweek("o_orderdate").cast("long").alias("dow"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
                "plus3mo"
            ),
            F.datediff("o_orderdate", F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since_95"),
        )
    )


# ---------------------------------------------------------------------------
# D3 — math functions
# ---------------------------------------------------------------------------


@graded(
    "func_math",
    oracle="""
        SELECT p_partkey,
               abs(p_size - 25) AS dist25,
               CAST(sign(p_size - 25) AS DOUBLE) AS sgn,
               CAST(power(p_size, 2) AS BIGINT) AS size_sq,
               round(sqrt(p_retailprice), 6) AS sqrt_price,
               round(ln(p_retailprice), 6) AS ln_price,
               round(log10(p_retailprice), 6) AS log10_price,
               CAST(ceil(p_retailprice / 7) AS BIGINT) AS ceil_div7,
               CAST(floor(p_retailprice / 7) AS BIGINT) AS floor_div7,
               greatest(p_size, 25) AS hi,
               least(p_size, 25) AS lo,
               p_size % 7 AS size_mod7
        FROM part WHERE p_partkey < 500
    """,
    section="D3",
    description="math family: abs/sign/power/sqrt/ln/log10/ceil/floor/greatest/least/mod",
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") < 500)
        .select(
            "p_partkey",
            F.abs(F.col("p_size") - 25).alias("dist25"),
            F.signum(F.col("p_size") - 25).alias("sgn"),
            F.pow("p_size", 2).cast("long").alias("size_sq"),
            F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
            F.round(F.log("p_retailprice"), 6).alias("ln_price"),
            F.round(F.log10("p_retailprice"), 6).alias("log10_price"),
            F.ceil(F.col("p_retailprice") / 7).alias("ceil_div7"),
            F.floor(F.col("p_retailprice") / 7).alias("floor_div7"),
            F.greatest("p_size", F.lit(25)).cast("long").alias("hi"),
            F.least("p_size", F.lit(25)).cast("long").alias("lo"),
            (F.col("p_size") % 7).alias("size_mod7"),
        )
    )


# ---------------------------------------------------------------------------
# D4 — conditional / null handling
# ---------------------------------------------------------------------------


@graded(
    "func_conditional",
    oracle="""
        SELECT event_id,
               CASE WHEN value > 150 THEN 'high'
                    WHEN value >= 50 THEN 'mid'
                    ELSE 'low' END AS band,
               coalesce(json_extract_string(props, '$.absent'), 'none') AS absent_or_none,
               nullif(event_type, 'click') AS type_or_null,
               CASE WHEN value IS NULL THEN -1 ELSE value END AS value_nvl
        FROM events WHERE event_id < 2000
    """,
    section="D4",
    description="when/otherwise, coalesce, nullif, nvl-style null handling",
)
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "events", sf_dir)
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.when(F.col("value") > 150, "high")
            .when(F.col("value") >= 50, "mid")
            .otherwise("low")
            .alias("band"),
            F.coalesce(
                F.get_json_object("props", "$.absent"), F.lit("none")
            ).alias("absent_or_none"),
            F.nullif("event_type", F.lit("click")).alias("type_or_null"),
            F.nvl("value", F.lit(-1.0)).alias("value_nvl"),
        )
    )


# ---------------------------------------------------------------------------
# D5 — array functions (incl. lambda higher-order functions)
# ---------------------------------------------------------------------------


@graded(
    "func_array",
    oracle="""
        SELECT vec_id,
               len(embedding) AS n_dims,
               round(CAST(embedding[1] AS DOUBLE), 4) AS e1,
               len(list_filter(embedding, x -> x > 0)) AS n_positive,
               round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) AS max_e,
               round(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sumsq
        FROM embeddings WHERE vec_id < 200
    """,
    section="D5",
    description="array family: size, element_at, filter/transform/aggregate lambdas",
)
def func_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = F.col("embedding")
    return (
        load(spark, "embeddings", sf_dir)
        .filter(F.col("vec_id") < 200)
        .select(
            "vec_id",
            F.size("embedding").cast("long").alias("n_dims"),
            F.round(F.element_at("embedding", 1).cast("double"), 4).alias("e1"),
            F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_positive"),
            F.round(F.array_max("embedding").cast("double"), 4).alias("max_e"),
            F.round(
                F.aggregate(
                    emb,
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                ),
                6,
            ).alias("sumsq"),
        )
    )


# ---------------------------------------------------------------------------
# D6/D7 — map + JSON functions over the message-properties column
# ---------------------------------------------------------------------------


@graded(
    "func_map_json",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
               CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled,
               json_extract_string(props, '$.missing') AS missing_val
        FROM events WHERE event_id < 2000
    """,
    section="D6,D7",
    description="JSON property extraction + typed access (from_json map path on "
    "the Spark side, json_extract on the oracle)",
)
def func_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Parse once into a real MapType column (D6), then read keys from the map —
    # the Spark-idiomatic form of the properties map; the oracle reads the
    # same values straight from JSON.
    props_map = F.from_json("props", "map<string,string>")
    return (
        load(spark, "events", sf_dir)
        .filter(F.col("event_id") < 2000)
        .withColumn("pm", props_map)
        .select(
            "event_id",
            F.element_at("pm", "k").alias("k_str"),
            F.element_at("pm", "k").cast("int").alias("k_int"),
            (F.element_at("pm", "k").cast("int") * 2).alias("k_doubled"),
            F.element_at("pm", "missing").alias("missing_val"),
        )
    )


# ---------------------------------------------------------------------------
# D1b — string functions, second sampler (split/repeat/affix tests/locate)
# ---------------------------------------------------------------------------


@graded(
    "func_string2",
    oracle="""
        SELECT p_partkey,
               string_split(p_name, ' ')[1] AS first_tok,
               string_split(p_name, ' ')[-1] AS last_tok,
               len(string_split(p_name, ' ')) AS n_toks,
               repeat(p_brand, 2) AS brand2,
               (p_name LIKE 'c%') AS starts_c,
               (p_name LIKE '%t') AS ends_t,
               contains(p_name, 'id') AS has_id,
               rtrim(p_name, 'te') AS rtrimmed,
               replace(p_name, ' ', '_') AS snake
        FROM part WHERE p_partkey < 300
    """,
    section="D1",
    description="string family 2: split/element access, repeat, affix tests, "
    "set-trim, replace",
)
def func_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("p_name", " ")
    return (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.element_at(toks, 1).alias("first_tok"),
            F.element_at(toks, -1).alias("last_tok"),
            F.size(toks).cast("long").alias("n_toks"),
            F.repeat("p_brand", 2).alias("brand2"),
            F.startswith(F.col("p_name"), F.lit("c")).alias("starts_c"),
            F.endswith(F.col("p_name"), F.lit("t")).alias("ends_t"),
            F.contains(F.col("p_name"), F.lit("id")).alias("has_id"),
            F.expr("rtrim('te', p_name)").alias("rtrimmed"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        )
    )


# ---------------------------------------------------------------------------
# D2b — date/time second sampler: epoch conversions, constructors
# ---------------------------------------------------------------------------


@graded(
    "func_datetime2",
    oracle="""
        -- epoch(ts) is a DOUBLE whose BIGINT cast *rounds*; Spark's
        -- unix_timestamp truncates — floor via integer division instead
        SELECT event_id,
               epoch_us(ts) // 1000000 AS epoch_s,
               epoch_us(ts) AS epoch_us,
               strftime(make_date(2024, 1 + (epoch_us(ts) // 1000000) % 12, 1), '%Y-%m-%d')
                 AS made_date,
               hour(ts) AS hh, minute(ts) AS mi,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso
        FROM events WHERE event_id < 1000
    """,
    section="D2",
    description="date/time family 2: epoch seconds/micros, make_date, "
    "hour/minute parts, strftime formatting",
)
def func_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "events", sf_dir)
        .filter(F.col("event_id") < 1000)
        .select(
            "event_id",
            F.unix_timestamp("ts").alias("epoch_s"),
            F.unix_micros("ts").alias("epoch_us"),
            F.date_format(
                F.make_date(
                    F.lit(2024), (F.unix_timestamp("ts") % 12 + 1).cast("int"), F.lit(1)
                ),
                "yyyy-MM-dd",
            ).alias("made_date"),
            F.hour("ts").cast("long").alias("hh"),
            F.minute("ts").cast("long").alias("mi"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("iso"),
        )
    )


# ---------------------------------------------------------------------------
# D5b — array second sampler: slice/sort/flatten/sequence/zip
# ---------------------------------------------------------------------------


@graded(
    "func_array2",
    oracle="""
        SELECT vec_id,
               round(CAST(list_slice(embedding, 1, 3)[2] AS DOUBLE), 4) AS sliced_e2,
               round(CAST(list_sort(embedding)[1] AS DOUBLE), 4) AS min_sorted,
               round(CAST(list_reverse_sort(embedding)[1] AS DOUBLE), 4) AS max_sorted,
               len(flatten([embedding, embedding])) AS flat_len,
               len(generate_series(1, 5)) AS seq_len,
               list_contains(list_transform(embedding, x -> x > 0.5), true) AS any_gt_half
        FROM embeddings WHERE vec_id < 150
    """,
    section="D5",
    description="array family 2: slice, sort asc/desc, flatten, sequence, "
    "transform+contains (exists pattern)",
)
def func_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = F.col("embedding")
    return (
        load(spark, "embeddings", sf_dir)
        .filter(F.col("vec_id") < 150)
        .select(
            "vec_id",
            F.round(F.element_at(F.slice(emb, 1, 3), 2).cast("double"), 4).alias(
                "sliced_e2"
            ),
            F.round(F.element_at(F.sort_array(emb), 1).cast("double"), 4).alias(
                "min_sorted"
            ),
            F.round(
                F.element_at(F.sort_array(emb, asc=False), 1).cast("double"), 4
            ).alias("max_sorted"),
            F.size(F.flatten(F.array(emb, emb))).cast("long").alias("flat_len"),
            F.size(F.sequence(F.lit(1), F.lit(5))).cast("long").alias("seq_len"),
            F.exists(emb, lambda x: x > 0.5).alias("any_gt_half"),
        )
    )


# ---------------------------------------------------------------------------
# D6b — map second sampler over the parsed properties map
# ---------------------------------------------------------------------------


@graded(
    "func_map2",
    oracle="""
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), ':') AS prop_keys,
               1 AS n_props,
               json_extract_string(props, '$.k') AS k_from_entries,
               CAST(json_extract_string(props, '$.k') AS INTEGER) * 10 AS k_x10
        FROM events WHERE event_id < 1000
    """,
    section="D6",
    description="map family 2: map_keys/size/transform_values on the parsed "
    "properties map (json_keys twin on the oracle)",
)
def func_map2(spark: SparkSession, sf_dir: str) -> DataFrame:
    pm = F.from_json("props", "map<string,string>")
    return (
        load(spark, "events", sf_dir)
        .filter(F.col("event_id") < 1000)
        .withColumn("pm", pm)
        .select(
            "event_id",
            _sjoin(F.sort_array(F.map_keys("pm"))).alias("prop_keys"),
            F.size("pm").alias("n_props"),
            F.element_at(F.map_values("pm"), 1).alias("k_from_entries"),
            F.element_at(
                F.transform_values(
                    "pm", lambda k, v: v.cast("int") * 10
                ).alias("x"),
                "k",
            ).alias("k_x10"),
        )
    )


# ---------------------------------------------------------------------------
# D8 — hash / digest functions
# ---------------------------------------------------------------------------


@graded(
    "func_hash",
    oracle="""
        SELECT doc_id,
               md5(text) AS md5_hex,
               sha256(text) AS sha256_hex
        FROM documents WHERE doc_id < 200
    """,
    section="D8",
    description="cross-engine digests: md5 + sha256 (dedup-key material)",
)
def func_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.md5(F.col("text").cast("binary")).alias("md5_hex"),
            F.sha2(F.col("text").cast("binary"), 256).alias("sha256_hex"),
        )
    )


@graded(
    "func_hash_spark_native",
    oracle=None,  # xxhash64 / murmur3 / crc32 have no DuckDB twins (SURVEY D8)
    section="D8,D3",
    description="Spark-native hashes (xxhash64, murmur3 hash, crc32) + bround — "
    "rows-only by design",
)
def func_hash_spark_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.xxhash64("text").alias("xx64"),
            F.hash("text").alias("murmur3"),
            F.crc32(F.col("text").cast("binary")).alias("crc"),
            F.bround(F.col("n_chars") / 7, 2).alias("banker_round"),
        )
    )


@graded(
    "func_string3",
    oracle="""
        SELECT p_partkey,
               split_part(p_name, ' ', 1) AS word1,
               split_part(p_name, ' ', 2) AS word2,
               left(p_name, 4) AS l4,
               right(p_name, 3) AS r3,
               CAST(ascii(p_name) AS BIGINT) AS first_code,
               chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS letter,
               strpos(p_name, 'o') AS pos_o,
               concat(substring(p_name, 1, 1), 'XX', substring(p_name, 4)) AS overlaid
        FROM part WHERE p_partkey < 300
    """,
    section="D1",
    description="string family 3: split_part, left/right, ascii/chr, locate, "
    "overlay (DuckDB lacks overlay -> oracle emulates with substring concat)",
)
def func_string3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.split_part("p_name", F.lit(" "), F.lit(1)).alias("word1"),
            F.split_part("p_name", F.lit(" "), F.lit(2)).alias("word2"),
            F.left("p_name", F.lit(4)).alias("l4"),
            F.right("p_name", F.lit(3)).alias("r3"),
            F.ascii("p_name").cast("long").alias("first_code"),
            F.chr(F.lit(65) + (F.col("p_partkey") % 26)).alias("letter"),
            F.locate("o", F.col("p_name")).cast("long").alias("pos_o"),
            F.overlay("p_name", F.lit("XX"), F.lit(2)).alias("overlaid"),
        )
    )


@graded(
    "func_datetime3",
    oracle="""
        SELECT o_orderkey,
               weekofyear(o_orderdate) AS iso_week,
               dayofyear(o_orderdate) AS doy,
               CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
               strftime(o_orderdate, '%Y-%m-%d') AS iso_date
        FROM orders WHERE o_orderkey < 1000
    """,
    section="D2",
    description="date/time family 3: ISO week / day-of-year / ISO weekday "
    "(both engines use ISO-8601 week numbering; Spark weekday() is "
    "0=Monday, DuckDB isodow is 1=Monday -> +1 shim)",
)
def func_datetime3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
            F.dayofyear("o_orderdate").cast("long").alias("doy"),
            (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
        )
    )


@graded(
    "func_array3",
    oracle="""
        WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part
                   WHERE p_partkey < 300)
        SELECT p_partkey,
               CAST(coalesce(list_position(toks, 'blue'), 0) AS BIGINT) AS pos_blue,
               array_to_string(list_filter(toks, x -> x != 'blue'), ':') AS no_blue,
               list_has_any(toks, ['blue', 'red']) AS has_primary,
               array_to_string(list_append(toks, 'zzz'), ':') AS appended,
               array_to_string(list_prepend('aaa', toks), ':') AS prepended,
               array_to_string(list_sort(list_distinct(toks || ['widget'])), ':')
                 AS union_widget,
               array_to_string(
                   list_sort(list_filter(list_distinct(toks),
                                         x -> NOT list_contains(['blue', 'red'], x))),
                   ':') AS except_primary,
               array_to_string(list_transform(toks, x -> CAST(length(x) AS VARCHAR)),
                   ':') AS tok_lens,
               len(list_filter(toks, x -> length(x) > 2)) = len(toks) AS all_long
        FROM t
    """,
    section="D5",
    description="array family 3: position/remove/overlap/append/prepend/"
    "union/except/transform/forall (order-sensitive ops sorted on both "
    "engines; Spark array_position returns 0 for missing vs DuckDB NULL "
    "-> coalesce shim).  Array outputs joined to strings on both engines "
    "(driver hash-gate parity trap, CORRECTNESS_r04)",
)
def func_array3(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("p_name", " ")
    return (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.array_position(toks, "blue").alias("pos_blue"),
            _sjoin(F.array_remove(toks, "blue")).alias("no_blue"),
            F.arrays_overlap(toks, F.array(F.lit("blue"), F.lit("red"))).alias(
                "has_primary"
            ),
            _sjoin(F.array_append(toks, F.lit("zzz"))).alias("appended"),
            _sjoin(F.array_prepend(toks, F.lit("aaa"))).alias("prepended"),
            _sjoin(
                F.sort_array(
                    F.array_distinct(F.array_union(toks, F.array(F.lit("widget"))))
                )
            ).alias("union_widget"),
            _sjoin(
                F.sort_array(
                    F.array_except(toks, F.array(F.lit("blue"), F.lit("red")))
                )
            ).alias("except_primary"),
            _sjoin(F.transform(toks, lambda x: F.length(x).cast("long"))).alias(
                "tok_lens"
            ),
            F.forall(toks, lambda x: F.length(x) > 2).alias("all_long"),
        )
    )


@graded(
    "func_map3",
    oracle="""
        SELECT p_partkey,
               CAST(p_size AS BIGINT) AS sz,
               CAST(length(p_brand) AS BIGINT) AS blen,
               CAST(CASE WHEN p_size > 10 THEN 1 ELSE 0 END
                    + CASE WHEN length(p_brand) > 10 THEN 1 ELSE 0 END
                    + CASE WHEN p_partkey % 100 > 10 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_gt10,
               'PK:SZ' AS keys_up,
               CAST(2 AS BIGINT) AS n_entries
        FROM part WHERE p_partkey < 300
    """,
    section="D6",
    description="map family 3 (construction side): map_from_arrays, map_concat, "
    "map_filter, transform_keys, map_entries — scalar outputs so the oracle "
    "is direct computation (DuckDB MAP extraction semantics vary by version; "
    "same manual-twin approach as the pivot oracle)",
)
def func_map3(spark: SparkSession, sf_dir: str) -> DataFrame:
    m1 = F.map_from_arrays(
        F.array(F.lit("sz"), F.lit("pk")),
        F.array(F.col("p_size").cast("long"), (F.col("p_partkey") % 100).cast("long")),
    )
    m2 = F.map_concat(
        m1,
        F.create_map(F.lit("blen"), F.length("p_brand").cast("long")),
    )
    return (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.element_at(m2, "sz").alias("sz"),
            F.element_at(m2, "blen").alias("blen"),
            F.size(F.map_filter(m2, lambda k, v: v > 10)).cast("long").alias("n_gt10"),
            _sjoin(
                F.sort_array(
                    F.map_keys(F.transform_keys(m1, lambda k, v: F.upper(k)))
                )
            ).alias("keys_up"),
            F.size(F.map_entries(m1)).cast("long").alias("n_entries"),
        )
    )


# ---------------------------------------------------------------------------
# D3b — bitwise scalar + aggregate family
# ---------------------------------------------------------------------------


@graded(
    "func_bitwise",
    oracle="""
        SELECT p_partkey,
               p_partkey & 255 AS low_byte,
               p_partkey | 4096 AS with_flag,
               xor(p_partkey, 1365) AS xored,
               p_partkey << 3 AS shl3,
               p_partkey >> 2 AS shr2,
               ~p_partkey AS inverted,
               CAST(bit_count(p_partkey) AS INT) AS popcount
        FROM part WHERE p_partkey < 500
    """,
    section="D3,D8",
    description="bitwise scalar family: and/or/xor masks, shifts, "
    "complement, popcount — exact int64 ops, identical in every engine",
)
def func_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("p_partkey")
    return (
        load(spark, "part", sf_dir)
        .filter(k < 500)
        .select(
            "p_partkey",
            k.bitwiseAND(F.lit(255)).alias("low_byte"),
            k.bitwiseOR(F.lit(4096)).alias("with_flag"),
            k.bitwiseXOR(F.lit(1365)).alias("xored"),
            F.shiftleft(k, 3).cast("long").alias("shl3"),
            F.shiftright(k, 2).cast("long").alias("shr2"),
            F.bitwise_not(k).alias("inverted"),
            F.bit_count(k).alias("popcount"),
        )
    )


@graded(
    "agg_bitwise",
    oracle="""
        SELECT p_brand,
               bit_and(p_size) AS size_and,
               bit_or(p_size) AS size_or,
               bit_xor(p_size) AS size_xor
        FROM part GROUP BY 1
    """,
    section="C11,D3",
    description="bitwise aggregates bit_and/bit_or/bit_xor per group — "
    "commutative+associative, so partition-order-proof by construction",
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "part", sf_dir)
        .groupBy("p_brand")
        .agg(
            F.bit_and("p_size").alias("size_and"),
            F.bit_or("p_size").alias("size_or"),
            F.bit_xor("p_size").alias("size_xor"),
        )
    )


@graded(
    "func_array4",
    oracle="""
        WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part
                   WHERE p_partkey < 300)
        SELECT p_partkey,
               array_to_string(list_transform(generate_series(1, len(toks)),
                   i -> CAST(CAST(i AS BIGINT) * length(toks[i]) AS VARCHAR)),
                   ':') AS pos_weighted,
               array_to_string(list_transform(generate_series(1, least(len(toks), 3)),
                   i -> toks[i] || ':' || CAST(i - 1 AS VARCHAR)), '|') AS zipped3,
               array_to_string(list_filter(['x', NULL, 'y', NULL],
                   v -> v IS NOT NULL), ':') AS compacted,
               array_to_string(list_transform(generate_series(1, 3), i -> toks[1]),
                   ':') AS first3x,
               array_to_string(toks[1:2] || ['INS'] || toks[3:], ':') AS inserted,
               len(list_filter(toks, x -> length(x) >= 6)) > 0 AS any_long,
               list_reduce(list_prepend('', toks),
                           (acc, x) -> acc || '|' || x) AS piped
        FROM t
    """,
    section="D5",
    description="array family 4 (index-aware higher-order ops): "
    "position-weighted transform (zip_with over an index sequence), "
    "element:index zip of the first 3 tokens, null compaction, "
    "array_repeat, array_insert (slice-splice twin on DuckDB), exists, "
    "and a reduce/fold concat — closes the D5 lambda surface.  Array "
    "outputs are joined to strings on both engines: the driver hash gate "
    "cannot canonicalize raw array cells (CORRECTNESS_r04 parity trap)",
)
def func_array4(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("p_name", " ")
    return (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            _sjoin(
                F.zip_with(
                    F.sequence(F.lit(1), F.size(toks)),
                    toks,
                    lambda i, x: i.cast("long") * F.length(x),
                )
            ).alias("pos_weighted"),
            _sjoin(
                F.transform(
                    F.slice(toks, 1, 3),
                    lambda x, i: F.concat_ws(":", x, i.cast("string")),
                ),
                sep="|",
            ).alias("zipped3"),
            _sjoin(
                F.array_compact(
                    F.array(F.lit("x"), F.lit(None), F.lit("y"), F.lit(None))
                )
            ).alias("compacted"),
            _sjoin(F.array_repeat(F.element_at(toks, 1), 3)).alias("first3x"),
            _sjoin(F.array_insert(toks, 3, F.lit("INS"))).alias("inserted"),
            F.exists(toks, lambda x: F.length(x) >= 6).alias("any_long"),
            F.aggregate(
                toks,
                F.lit(""),
                lambda acc, x: F.concat(acc, F.lit("|"), x),
            ).alias("piped"),
        )
    )


@graded(
    "func_regex",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
               CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT)
                   AS n_vowel_runs,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
               regexp_matches(p_name, '^[a-z]+ ') AS starts_with_word,
               regexp_extract(p_name, '([a-z]{5,})') AS first_long_word
        FROM part WHERE p_partkey < 300
    """,
    section="D1,B8",
    description="regex family: group extraction, extract-all run counts, "
    "GLOBAL replacement (Spark default vs DuckDB 'g' flag — the parity "
    "trap made explicit), anchored match test, and first-long-token "
    "capture — the B8 selector machinery exposed as scalar functions",
)
def func_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias(
                "second_word"
            ),
            F.size(F.regexp_extract_all("p_name", F.lit(r"[aeiou]+"), 0)).cast(
                "long"
            ).alias("n_vowel_runs"),
            F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
            F.col("p_name").rlike(r"^[a-z]+ ").alias("starts_with_word"),
            F.regexp_extract("p_name", r"([a-z]{5,})", 1).alias(
                "first_long_word"
            ),
        )
    )
