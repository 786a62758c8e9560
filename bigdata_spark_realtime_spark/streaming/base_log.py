"""base_log split pipeline — ods_BaseLogApp re-expressed
(SURVEY.md §3.1 stages 2-6; reference `app/ods_BaseLogApp.scala:79-181`).

One raw JSON stream multiplexes into 5 child outputs (T6): err / page /
display / action / start. The reference loops per record inside
foreachPartition and calls producer.send per row; here each branch is a
declarative filter+projection and Catalyst evaluates the shared parse
once per branch pipeline inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.schemas import RAW_LOG_SCHEMA

#: PageLog projection from the parsed log struct
#: (`bean/PageLog.scala:3-19`; nested access `app/ods_BaseLogApp.scala:92-117`)
_PAGE_COMMON = [
    ("common.mid", "mid"),
    ("common.uid", "user_id"),
    ("common.ar", "province_id"),
    ("common.ch", "channel"),
    ("common.is_new", "is_new"),
    ("common.md", "model"),
    ("common.os", "operate_system"),
    ("common.vc", "version_code"),
    ("common.ba", "brand"),
]


def parse_raw_log(raw: DataFrame) -> DataFrame:
    """raw(value string) → value + parsed struct. Malformed JSON yields a
    NULL struct (PERMISSIVE), which falls out of every branch filter —
    same drop-bad-records behavior as the reference's try-less parse."""
    return raw.select("value", F.from_json("value", RAW_LOG_SCHEMA).alias("log"))


def split_base_log(raw: DataFrame) -> dict[str, DataFrame]:
    """The T6 multiplex: one input → {err, page, display, action, start}.

    Branch predicates follow the reference exactly: err records route
    whole to the error output and nothing else; page-rows also feed the
    display/action explodes; start is mutually exclusive with page.
    """
    parsed = parse_raw_log(raw)
    err = parsed.where(F.col("log.err").isNotNull()).select("value")
    ok = parsed.where(F.col("log.err").isNull()).select("log")

    common_cols = [F.col(f"log.{src}").alias(dst) for src, dst in _PAGE_COMMON]

    page_rows = ok.where(F.col("log.page").isNotNull())
    page = page_rows.select(
        *common_cols,
        F.col("log.page.page_id").alias("page_id"),
        F.col("log.page.last_page_id").alias("last_page_id"),
        F.col("log.page.item").alias("page_item"),
        F.col("log.page.item_type").alias("page_item_type"),
        F.col("log.page.during_time").alias("during_time"),
        F.col("log.page.source_type").alias("sourceType"),
        F.col("log.ts").alias("ts"),
    )

    # T7: denormalizing explodes — each array element carries the parent
    # page fields (`app/ods_BaseLogApp.scala:122-159`); empty/absent
    # arrays emit nothing (plain explode, not explode_outer)
    display = page_rows.select(
        *common_cols,
        F.col("log.page.page_id").alias("page_id"),
        F.col("log.ts").alias("ts"),
        F.explode("log.displays").alias("d"),
    ).select(
        "mid", "user_id", "province_id", "channel", "is_new", "model",
        "operate_system", "version_code", "brand", "page_id", "ts",
        F.col("d.display_type").alias("display_type"),
        F.col("d.item").alias("display_item"),
        F.col("d.item_type").alias("display_item_type"),
        F.col("d.order").alias("display_order"),
        F.col("d.pos_id").alias("display_pos_id"),
    )

    action = page_rows.select(
        *common_cols,
        F.col("log.page.page_id").alias("page_id"),
        F.explode("log.actions").alias("a"),
    ).select(
        "mid", "user_id", "province_id", "channel", "is_new", "model",
        "operate_system", "version_code", "brand", "page_id",
        F.col("a.action_id").alias("action_id"),
        F.col("a.item").alias("action_item"),
        F.col("a.item_type").alias("action_item_type"),
        F.col("a.ts").alias("action_ts"),
    )

    start = ok.where(F.col("log.start").isNotNull()).select(
        *common_cols,
        F.col("log.start.entry").alias("entry"),
        F.col("log.start.loading_time").alias("loading_time_ms"),
        F.col("log.start.open_ad_id").alias("open_ad_id"),
        F.col("log.start.open_ad_ms").alias("open_ad_ms"),
        F.col("log.start.open_ad_skip_ms").alias("open_ad_skip_ms"),
        F.col("log.ts").alias("ts"),
    )

    return {"err": err, "page": page, "display": display, "action": action, "start": start}
