"""Array / map / JSON operators over semi-structured columns
(SURVEY.md §2.2): events.props JSON, documents.text token arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load

_JSON_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q_json_get_path", oracle=_JSON_ORACLE)
def q_json_get_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# from_json into a typed struct — the schema-on-read path a real audit
# pipeline uses for <AuditRecord> props (SURVEY.md §1.2).
_FROMJSON_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
WHERE event_id < 100 AND CAST(json_extract_string(props, '$.k') AS INT) > 50
ORDER BY event_id
"""


@query("q_json_from_json", oracle=_FROMJSON_ORACLE)
def q_json_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = e.withColumn("j", F.from_json("props", schema))
    return (
        parsed.select("event_id", F.col("j.k").alias("k"))
        .filter(F.col("k") > 50)
        .orderBy("event_id")
    )


_TOJSON_ORACLE = """
SELECT n_nationkey,
       concat('{"nation":"', n_name, '","region":', CAST(n_regionkey AS VARCHAR), '}') AS j
FROM nation
ORDER BY n_nationkey
"""


@query("q_json_to_json", oracle=_TOJSON_ORACLE)
def q_json_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(
            F.struct(
                F.col("n_name").alias("nation"), F.col("n_regionkey").alias("region")
            )
        ).alias("j"),
    ).orderBy("n_nationkey")


_ARRAY_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       string_split(text, ' ')[1] AS first_tok,
       array_to_string(string_split(text, ' ')[1:3], '_') AS first3,
       CAST(list_contains(string_split(text, ' '), 'data') AS BOOLEAN) AS has_data,
       len(list_distinct(string_split(text, ' '))) AS n_unique
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
"""


@query("q_array_ops", oracle=_ARRAY_ORACLE)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        toks.getItem(0).alias("first_tok"),
        F.array_join(F.slice(toks, 1, 3), "_").alias("first3"),
        F.array_contains(toks, "data").alias("has_data"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
    ).orderBy("doc_id")


# Higher-order array functions: transform / filter / aggregate — compiled
# to JVM expressions, no Python.
_HOF_ORACLE = """
SELECT doc_id,
       array_to_string(list_transform(string_split(text, ' ')[1:5], x -> upper(x)), ' ') AS first5_upper,
       len(list_filter(string_split(text, ' '), x -> length(x) > 6)) AS n_long_tokens,
       list_reduce(list_prepend(0, list_transform(string_split(text, ' '), x -> length(x))), (a, x) -> a + x) AS total_chars
FROM documents
WHERE doc_id < 50
ORDER BY doc_id
"""


@query("q_array_higher_order", oracle=_HOF_ORACLE)
def q_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(F.slice(toks, 1, 5), lambda x: F.upper(x)), " "
        ).alias("first5_upper"),
        F.size(F.filter(toks, lambda x: F.length(x) > 6)).alias("n_long_tokens"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
    ).orderBy("doc_id")


_EXPLODE_ORACLE = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
"""


@query("q_explode_wordcount", oracle=_EXPLODE_ORACLE)
def q_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode_outer(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


# Map construction + element access; oracle expresses the same result
# relationally (maps are a Spark-side representation choice).
_MAP_ORACLE = """
SELECT doc_id, lang AS lang_val, source AS source_val, 2 AS map_size
FROM documents
WHERE doc_id < 50
ORDER BY doc_id
"""


@query("q_map_ops", oracle=_MAP_ORACLE)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    ).alias("m")
    return d.select("doc_id", m).select(
        "doc_id",
        F.element_at("m", "lang").alias("lang_val"),
        F.element_at("m", "source").alias("source_val"),
        F.size("m").alias("map_size"),
    ).orderBy("doc_id")


# json_tuple: multi-path extraction in one parse pass (vs one
# get_json_object call per path), plus schema_of_json inference. The
# round-trip (to_json -> json_tuple) exercises both directions; the
# inferred-schema string is deterministic for the fixed props shape.
_JSONTUPLE_ORACLE = """
SELECT event_id,
       event_type AS jt_type,
       CAST(user_id AS VARCHAR) AS jt_user,
       json_extract_string(props, '$.k') AS jt_k,
       'STRUCT<k: BIGINT>' AS props_schema
FROM events
WHERE event_id < 100
ORDER BY event_id
"""


@query("q_json_tuple", oracle=_JSONTUPLE_ORACLE)
def q_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    j = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").alias("k"),
        )
    )
    return (
        e.withColumn("j", j)
        .select(
            "event_id",
            F.json_tuple(F.col("j"), "t", "u", "k").alias("jt_type", "jt_user", "jt_k"),
            F.schema_of_json(F.lit('{"k": 69}')).alias("props_schema"),
        )
        .orderBy("event_id")
    )


# posexplode with position arithmetic.
_POSEXPLODE_ORACLE = """
SELECT doc_id, pos - 1 AS pos, word
FROM (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id < 5
)
WHERE pos - 1 < 10
ORDER BY doc_id, pos
"""


@query("q_posexplode", oracle=_POSEXPLODE_ORACLE)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    return (
        d.select("doc_id", F.posexplode_outer(F.split("text", " ")).alias("pos", "word"))
        .filter(F.col("pos") < 10)
        .orderBy("doc_id", "pos")
    )


# Spark 4 VARIANT path: parse_json once into the binary variant encoding,
# then typed variant_get extraction — the semi-structured storage model
# that replaces per-access string re-parsing (get_json_object re-parses
# the JSON text on every call; a variant column parses once and serves
# every downstream extraction). The oracle extracts the same field with
# DuckDB's JSON functions, proving value parity across representations.
_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q_json_variant", oracle=_VARIANT_ORACLE)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
