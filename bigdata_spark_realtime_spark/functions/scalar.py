"""Scalar column functions — the reference's F1-F11 (SURVEY.md §2.4).

Each function has a Spark Column form and, where a DuckDB oracle exists,
a matching ``*_sql`` snippet generator; queries and oracles are built
from the same pair so they can't drift.

All date/hour derivations assume the session timezone is pinned to UTC
(session.py) — the reference used JVM-default-TZ SimpleDateFormat
(`app/dwd_DauApp.scala:99-100,164-172`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F1/F2 — epoch-ms/timestamp → 'yyyy-MM-dd' dt and zero-padded 'HH' hr
# (`app/dwd_DauApp.scala:92,99-100,119,164-172`). hr stays a STRING to match
# the reference bean (`bean/DauInfo.scala:29`, SURVEY §7.3).
# ---------------------------------------------------------------------------


def dt_col(ts: Column | str) -> Column:
    return F.date_format(ts, "yyyy-MM-dd")


def dt_sql(ts: str) -> str:
    return f"strftime({ts}, '%Y-%m-%d')"


def hr_col(ts: Column | str) -> Column:
    return F.date_format(ts, "HH")


def hr_sql(ts: str) -> str:
    return f"strftime({ts}, '%H')"


# ---------------------------------------------------------------------------
# F4 — calendar-exact age in years from a birthday
# (`app/dwd_DauApp.scala:136-141`: java.time.Period.between(...).getYears).
# Expressed as year difference minus one if the (month, day) anniversary has
# not yet passed — identical arithmetic in Spark and DuckDB, no epoch math.
# ---------------------------------------------------------------------------


def age_years(birthday: Column, ref: Column) -> Column:
    not_yet = (F.month(ref) < F.month(birthday)) | (
        (F.month(ref) == F.month(birthday)) & (F.dayofmonth(ref) < F.dayofmonth(birthday))
    )
    return (F.year(ref) - F.year(birthday) - F.when(not_yet, 1).otherwise(0)).cast("int")


def age_years_sql(birthday: str, ref: str) -> str:
    return (
        f"CAST(year({ref}) - year({birthday}) - CASE WHEN month({ref}) < month({birthday}) "
        f"OR (month({ref}) = month({birthday}) AND day({ref}) < day({birthday})) "
        f"THEN 1 ELSE 0 END AS INT)"
    )


# ---------------------------------------------------------------------------
# F8 — age bucketing <=20 / 21-29 / >=30 (`ia/publisherServiceImpl.java:57-78`)
# ---------------------------------------------------------------------------

AGE_BUCKET_LABELS = ("20岁以下", "20岁到29岁", "30岁以上")


def age_bucket(age: Column) -> Column:
    return (
        F.when(age <= 20, AGE_BUCKET_LABELS[0])
        .when(age <= 29, AGE_BUCKET_LABELS[1])
        .otherwise(AGE_BUCKET_LABELS[2])
    )


def age_bucket_sql(age: str) -> str:
    return (
        f"CASE WHEN {age} <= 20 THEN '{AGE_BUCKET_LABELS[0]}' "
        f"WHEN {age} <= 29 THEN '{AGE_BUCKET_LABELS[1]}' "
        f"ELSE '{AGE_BUCKET_LABELS[2]}' END"
    )


# ---------------------------------------------------------------------------
# F9 — gender decode F→女 M→男 (`ia/publisherServiceImpl.java:45-56`)
# ---------------------------------------------------------------------------


def gender_decode(g: Column) -> Column:
    return F.when(g == "F", "女").when(g == "M", "男").otherwise(g)


def gender_decode_sql(g: str) -> str:
    return f"CASE WHEN {g} = 'F' THEN '女' WHEN {g} = 'M' THEN '男' ELSE {g} END"


# ---------------------------------------------------------------------------
# F10 — ES match(field, item).operator(AND) emulation
# (`ia/PublisherMapperImpl.java:74-76,120-121`). Engine contract per SURVEY
# §7.3: every whitespace token of `item` must be a substring of `field`.
# ---------------------------------------------------------------------------


def match_all_tokens(field: Column, item: str) -> Column:
    tokens = [t for t in item.split() if t]
    cond = F.lit(True)
    for t in tokens:
        cond = cond & field.contains(t)
    return cond


def match_all_tokens_sql(field: str, item: str) -> str:
    tokens = [t for t in item.split() if t]
    if not tokens:
        return "TRUE"
    return " AND ".join(f"contains({field}, '{t}')" for t in tokens)


# ---------------------------------------------------------------------------
# F11 — highlight: wrap the matched term in <em> tags
# (`ia/PublisherMapperImpl.java:127-144`). Literal-term replace (the
# reference highlights the analyzed term occurrences; our contract is the
# literal token).
# ---------------------------------------------------------------------------


def highlight(field: Column, term: str) -> Column:
    return F.replace(field, F.lit(term), F.lit(f"<em>{term}</em>"))


def highlight_sql(field: str, term: str) -> str:
    return f"replace({field}, '{term}', '<em>{term}</em>')"
