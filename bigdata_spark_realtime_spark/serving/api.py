"""The reference's three REST endpoints as a parameterized Python API
(SURVEY.md §2.11; `ia/PublisherController.java`).

A user of the reference's publisher service calls:
  GET /dauRealtime?td=...
  GET /statsByItem?itemName=..&date=..&t=age|gender
  GET /detailByItem?date=..&itemName=..&pageNo=..&pageSize=..
This class serves the same three shapes from the engine's tables
(`dau`, `order_wide` — any DataFrames with those columns, e.g. the
outputs of the streaming pipelines or the parquet serving store).

Response shapes mirror the Java DTOs 1:1; results are small by
construction (aggregates / one page), so the final collect is the
serving boundary, not a data move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import scalar as fns


class ServingAPI:
    """dau: DataFrame with (mid, dt, hr, ...); order_wide: DataFrame with
    (detail_id, sku_name, user_age, user_gender, split_total_amount,
    create_date, order_id, sku_id, sku_num, order_price, ...)."""

    def __init__(self, dau: DataFrame, order_wide: DataFrame) -> None:
        self.dau = dau
        self.order_wide = order_wide

    # -- GET /dauRealtime (`ia/PublisherMapperImpl.java:163-239`) ----------

    def dau_realtime(self, td: str) -> dict:
        import datetime

        yd = (datetime.date.fromisoformat(td) - datetime.timedelta(days=1)).isoformat()
        day = self.dau.where(F.col("dt").isin(td, yd))
        rows = (
            day.groupBy("dt", "hr").agg(F.count(F.lit(1)).alias("ct")).collect()
        )
        dau_td = {r.hr: r.ct for r in rows if r.dt == td}
        dau_yd = {r.hr: r.ct for r in rows if r.dt == yd}
        return {
            "dauTotal": sum(dau_td.values()),
            "dauTd": dau_td,
            "dauYd": dau_yd,
        }

    # -- GET /statsByItem (`ia/publisherServiceImpl.java:29-91`) -----------

    def stats_by_item(self, item_name: str, date: str, t: str) -> list[dict]:
        if t == "age":
            field = F.col("user_age")
        elif t == "gender":
            field = F.col("user_gender")
        else:
            # the reference NPEs on a bad t; we return a client error
            raise ValueError(f"unsupported t={t!r}: expected 'age' or 'gender'")
        # ES terms aggs order buckets by doc count desc
        # (`ia/PublisherMapperImpl.java:79`); the gated a4 plan
        # (plans/aggregations.py) does the same — keep the REST layer
        # bit-faithful to both, not amount-desc
        base = (
            self.order_wide.where(F.col("create_date") == date)
            .where(fns.match_all_tokens(F.col("sku_name"), item_name))
            .groupBy(field.alias("k"))
            .agg(
                F.sum("split_total_amount").alias("amount"),
                F.count(F.lit(1)).alias("ct"),
            )
            .orderBy(F.desc("ct"), "k")
            .limit(100)
        )
        if t == "gender":
            out = base.select(
                fns.gender_decode(F.col("k")).alias("name"),
                F.round("amount", 2).alias("value"),
            )
            return [r.asDict() for r in out.collect()]
        # age: client-side re-bucket of the terms agg (A5)
        out = base.groupBy(fns.age_bucket(F.col("k")).alias("name")).agg(
            F.round(F.sum("amount"), 2).alias("value")
        )
        return [r.asDict() for r in out.collect()]

    # -- GET /detailByItem (`ia/PublisherMapperImpl.java:112-159`) ---------

    DETAIL_COLS = (
        "create_date", "order_id", "detail_id", "sku_id", "sku_name",
        "sku_num", "order_price", "split_total_amount",
    )

    def detail_by_item(
        self, date: str, item_name: str, page_no: int = 1, page_size: int = 20
    ) -> dict:
        filtered = self.order_wide.where(F.col("create_date") == date).where(
            fns.match_all_tokens(F.col("sku_name"), item_name)
        )
        total = filtered.count()
        page = (
            filtered.select(
                *[c for c in self.DETAIL_COLS if c != "sku_name"],
                fns.highlight(F.col("sku_name"), item_name).alias("sku_name"),
            )
            .orderBy("order_id", "detail_id")
            .offset((page_no - 1) * page_size)
            .limit(page_size)
        )
        return {"total": total, "detail": [r.asDict() for r in page.collect()]}
