"""Funnel and retention analysis over the events stream table.

The two product-analytics operators every OLAP engine grows
specialized machinery for (ClickHouse `windowFunnel` /
`retention`, Druid/Amplitude cohort charts), expressed Spark-first as
staged aggregations — each stage is a user-keyed groupBy with
map-side partials, so the plan is a chain of small exchanges on the
same key, never a per-user sort of the raw stream.

* ``ext_funnel_steps`` — ordered signup → click → purchase
  completion: step 2 must happen strictly after the user's first
  signup, step 3 strictly after the earliest qualifying click, and
  the whole chain inside 7 days. min()-aggregations compose the
  sequence: t1 = first signup, t2 = first click after t1, t3 = first
  purchase after t2 — each a conditional min over one more join
  against the (tiny) per-user step table.
* ``ext_retention_cohorts`` — the signup-cohort activity matrix:
  cohort = each user's first-seen day, one row per (cohort_day,
  day_offset) counting distinct users active that day.

Exactness: all comparisons are integer epoch-microseconds / DATE
arithmetic; counts are exact. Timestamps never pass through floats.

Scale (100 TB): the raw scan happens once per operator; everything
after runs on user-cardinality rows (t1/t2/t3 tables, distinct
(user, day) pairs). The step joins broadcast nothing corpus-sized —
they are user-keyed equi-joins the AQE planner handles; the funnel
output is 3 rows, the retention matrix cohort × offset rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

#: funnel completion window (microseconds): 7 days
FUNNEL_WINDOW_US = 7 * 24 * 3_600_000_000

FUNNEL_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
s1 AS (
  SELECT user_id, min(us) AS t1 FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.us) AS t2
  FROM ev e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.us > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.us) AS t3
  FROM ev e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.us > s2.t2
  GROUP BY e.user_id
),
done AS (
  SELECT s3.user_id
  FROM s3 JOIN s1 ON s1.user_id = s3.user_id
  WHERE s3.t3 - s1.t1 <= {FUNNEL_WINDOW_US}
)
SELECT * FROM (
  SELECT 1 AS step, 'signup' AS step_name,
         CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
  UNION ALL
  SELECT 2, 'click_after_signup',
         CAST((SELECT count(*) FROM s2) AS BIGINT)
  UNION ALL
  SELECT 3, 'purchase_in_window',
         CAST((SELECT count(*) FROM done) AS BIGINT)
)
"""


@register("ext_funnel_steps", oracle=FUNNEL_ORACLE)
def ext_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel with a 7-day completion window."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    done = s3.join(s1, "user_id").where(
        F.col("t3") - F.col("t1") <= FUNNEL_WINDOW_US
    )

    def step_row(df: DataFrame, step: int, name: str) -> DataFrame:
        # lazy scalar aggregate — no builder-side action
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users")
        ).select(
            F.lit(step).cast("int").alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )

    return (
        step_row(s1, 1, "signup")
        .unionByName(step_row(s2, 2, "click_after_signup"))
        .unionByName(step_row(done, 3, "purchase_in_window"))
    )


RETENTION_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(d.day - c.cohort_day AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM days d JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


@register("ext_retention_cohorts", oracle=RETENTION_ORACLE)
def ext_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen-day cohorts × activity-day offsets — the retention
    matrix. distinct (user, day) happens once; the cohort table is
    user-cardinality; the final count groups cohort × offset rows."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("bigint").alias(
                "day_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


COOC_ORACLE = """
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase') AND props IS NOT NULL
)
SELECT a.item AS item_a, b.item AS item_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM ui a JOIN ui b
  ON a.user_id = b.user_id AND a.item < b.item
GROUP BY a.item, b.item
"""


@register("ext_item_cooccurrence", oracle=COOC_ORACLE)
def ext_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item co-occurrence counts — the collaborative-filtering /
    item-graph prep step (the input to ALS similarity, co-visitation
    recommenders, and graph clustering): for every item pair, how many
    users interacted with both.

    Scale (100 TB): distinct (user, item) happens once (one shuffle
    with map-side partials), then the pair expansion is a self
    equi-join ON THE USER KEY — pairs only ever materialize within a
    user's own item set, so the blow-up is bounded by per-user
    cardinality squared, not corpus size. Power users are the skew
    risk: cap per-user items upstream (`ext_sample_source_cap`'s
    quota-window shape) or let AQE's skew-join split the hot
    partitions; the same guarded-bucket-pairs machinery the LSH path
    uses (`plans/ext_dedup._bucket_pairs`) is the drop-in when user
    cardinality is adversarial. The final (item_a, item_b) count
    groupBy runs on item-pair-cardinality rows."""
    ev = load_table(spark, sf_dir, "events")
    ui = (
        ev.where(
            F.col("event_type").isin("click", "view", "purchase")
            & F.col("props").isNotNull()
        )
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        )
        .distinct()
    )
    a = ui.select("user_id", F.col("item").alias("item_a"))
    b = ui.select(F.col("user_id").alias("uid_b"), F.col("item").alias("item_b"))
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("uid_b"))
            & (F.col("item_a") < F.col("item_b")),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


TRANSITIONS_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id)
           AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n_transitions
FROM ordered
WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


@register("ext_event_transitions", oracle=TRANSITIONS_ORACLE)
def ext_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive event-type transition counts — the Markov
    census behind user-flow sankeys and next-action models. One lead
    window per user over (epoch-micros, event_id) — the integer
    composite key makes the ordering deterministic cross-engine even
    under timestamp ties — then a types² count groupBy.

    Scale (100 TB): the window shuffles on user_id (per-user event
    counts bound each partition's sort); the transition matrix output
    is event-type-cardinality squared. A production variant bounds the
    window per day to keep per-user state from growing unboundedly —
    same plan with the date in the partition key."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    ordered = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    return (
        ordered.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
