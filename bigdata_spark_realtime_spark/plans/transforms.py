"""Row-transform operators — SURVEY.md §2.3 (T1-T9).

The reference does all of these as per-record Scala loops inside
``foreachPartition`` (`app/ods_BaseLogApp.scala:79-181`,
`app/ods_BaseDBApp.scala:89-115`); here each is a declarative DataFrame
expression so Catalyst keeps them inside whole-stage codegen and pushes
filters/pruning into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# T1/T2/T3 — dynamic JSON parse + nested-field projection
# (`app/ods_BaseLogApp.scala:58-64,92-117`)
# ---------------------------------------------------------------------------

T1_ORACLE = """
SELECT event_id,
       event_type,
       CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
FROM events
"""


@register("t1_json_extract", oracle=T1_ORACLE)
def t1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON string → typed field, schema-on-read; absent keys → NULL."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


# ---------------------------------------------------------------------------
# T4/T5 — predicate routing: error records pass through unreshaped
# (`app/ods_BaseLogApp.scala:86-90`)
# ---------------------------------------------------------------------------

T4_ORACLE = """
SELECT event_id, user_id, event_type, value, props, epoch_ms(ts) AS ts_ms
FROM events
WHERE event_type = 'error'
"""


@register("t4_error_route", oracle=T4_ORACLE)
def t4_error_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error branch: whole raw record routed to the error output."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "props",
        F.unix_millis("ts").alias("ts_ms"),
    )


# ---------------------------------------------------------------------------
# T6 — multiplex split: one input stream → N labeled child streams
# (`app/ods_BaseLogApp.scala:79-181` splits into err/page/display/action/start)
# ---------------------------------------------------------------------------

T6_ORACLE = """
SELECT event_id, 'err' AS branch, event_type, value FROM events WHERE event_type = 'error'
UNION ALL
SELECT event_id, 'start' AS branch, event_type, value FROM events WHERE event_type = 'signup'
UNION ALL
SELECT event_id, 'page' AS branch, event_type, value FROM events WHERE event_type IN ('click', 'view')
UNION ALL
SELECT event_id, 'action' AS branch, event_type, value FROM events WHERE event_type = 'purchase'
"""


@register("t6_multiplex_split", oracle=T6_ORACLE)
def t6_multiplex_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One parsed stream feeds 4 filtered child outputs (union'd here so
    the result is one comparable DataFrame; in the streaming pipeline each
    branch has its own sink)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    # r15 optimization: the four branch predicates are disjoint (an
    # event has one type), so the multiplex is ONE scan with a CASE
    # label + non-null filter — the union form scanned events once per
    # branch. Row multiset identical; in the streaming pipeline each
    # branch still feeds its own sink.
    t = F.col("event_type")
    label = (
        F.when(t == "error", "err")
        .when(t == "signup", "start")
        .when(t.isin("click", "view"), "page")
        .when(t == "purchase", "action")
    )
    return (
        ev.select("event_id", label.alias("branch"), "event_type", "value")
        .where(F.col("branch").isNotNull())
    )


# ---------------------------------------------------------------------------
# T7 — denormalizing array explode (displays/actions flatten,
# `app/ods_BaseLogApp.scala:122-159`): parent fields join each element
# ---------------------------------------------------------------------------

T7_ORACLE = """
SELECT doc_id, lang, CAST(i AS INT) AS pos, token
FROM (
  -- zip-unnest (parallel unnests in one SELECT align element-wise)
  -- instead of the LATERAL range + toks[i + 1] indexing: the indexed
  -- form carries the whole token list on every output row, quadratic
  -- in document width (see plans/ext_lm.py LM_ORACLE)
  SELECT doc_id, lang,
         unnest(range(len(toks))) AS i, unnest(toks) AS token
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
        FROM documents)
)
"""


@register("t7_explode_tokens", oracle=T7_ORACLE)
def t7_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: each array element becomes a row carrying parent fields
    + its position (the reference hand-rolls this flatMap)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    )


# ---------------------------------------------------------------------------
# T8 — CDC op-type normalization then drop of unknown ops
# (`app/ods_BaseDBApp.scala:89-98`: bootstrap-insert→insert, i/u/d pass,
# else "null" then filtered)
# ---------------------------------------------------------------------------

T8_ORACLE = """
SELECT event_id, op FROM (
  SELECT event_id,
         CASE WHEN event_type = 'signup' THEN 'insert'
              WHEN event_type IN ('click', 'view') THEN 'update'
              WHEN event_type = 'purchase' THEN 'delete'
              ELSE 'null' END AS op
  FROM events
) WHERE op <> 'null'
"""


@register("t8_cdc_op_normalize", oracle=T8_ORACLE)
def t8_cdc_op_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-map of the op type; unknown ops normalized to 'null' and
    filtered (same shape as the reference's Maxwell envelope handling)."""
    ev = load_table(spark, sf_dir, "events")
    t = F.col("event_type")
    op = (
        F.when(t == "signup", "insert")
        .when(t.isin("click", "view"), "update")
        .when(t == "purchase", "delete")
        .otherwise("null")
    )
    return ev.select("event_id", op.alias("op")).where(F.col("op") != "null")


# ---------------------------------------------------------------------------
# T9 + K4/K6 naming (F5/F6) — set-membership routing: fact tables → Kafka
# topic `DWD_{TABLE}_{OP}`, dim tables → Redis key `DIM:{TABLE}:{id}`
# (`app/ods_BaseDBApp.scala:67-81,102-115`)
# ---------------------------------------------------------------------------

_FACT_TYPES = ("PROMO", "ECONOMY")
_DIM_TYPES = ("LARGE",)

T9_ORACLE = f"""
SELECT p_partkey,
       CASE WHEN p_type IN {_FACT_TYPES} THEN 'kafka' ELSE 'redis' END AS route,
       CASE WHEN p_type IN {_FACT_TYPES}
            THEN 'DWD_' || upper(p_type) || '_INSERT'
            ELSE 'DIM:' || upper(p_type) || ':' || CAST(p_partkey AS VARCHAR)
       END AS target
FROM part
WHERE p_type IN {_FACT_TYPES + _DIM_TYPES}
"""


@register("t9_table_routing", oracle=T9_ORACLE)
def t9_table_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing by set membership, with the reference's dynamic-topic /
    dim-key naming. The routing lists are plain `isin` filters — at scale
    they broadcast (they are metadata, not data)."""
    part = load_table(spark, sf_dir, "part")
    is_fact = F.col("p_type").isin(*_FACT_TYPES)
    return (
        part.where(F.col("p_type").isin(*(_FACT_TYPES + _DIM_TYPES)))
        .select(
            "p_partkey",
            F.when(is_fact, "kafka").otherwise("redis").alias("route"),
            F.when(
                is_fact,
                F.concat(F.lit("DWD_"), F.upper("p_type"), F.lit("_INSERT")),
            )
            .otherwise(
                F.concat(
                    F.lit("DIM:"),
                    F.upper("p_type"),
                    F.lit(":"),
                    F.col("p_partkey").cast("string"),
                )
            )
            .alias("target"),
        )
    )
