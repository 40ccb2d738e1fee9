"""Windowed/relational operators over the ``events`` table.

These exercise the relational checklist surface (SURVEY.md §2.5): the
reference's prev/next-neighbor rules are lag()-over-order patterns and its
words/blocks detection is break-flag + cumsum sessionization — here the
same shapes run relationally: gap-based sessionization and tumbling-window
aggregation (the batch form of the Structured Streaming window op).

Scale notes: both ops are one shuffle on the natural key (user_id / window
bucket) with map-side partial aggregation; no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_S = 1800  # 30 min


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to the
    previous event exceeds 30 minutes (lag + cumsum — the relational form of
    the kernel's words-detection break-flag pattern)."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.unix_timestamp("ts").alias("ts_s"), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    flagged = ev.withColumn(
        "new_session",
        (F.col("ts_s") - F.lag("ts_s").over(w) > SESSION_GAP_S)
        .cast("int")).fillna({"new_session": 1})
    with_ids = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (with_ids.groupBy("user_id", "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts_s").alias("session_start_s"),
                 F.max("ts_s").alias("session_end_s")))


SESSIONIZE_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id FROM events
), flagged AS (
  SELECT user_id, ts_s, event_id,
         CASE WHEN ts_s - lag(ts_s) OVER w > {SESSION_GAP_S} THEN 1
              WHEN lag(ts_s) OVER w IS NULL THEN 1
              ELSE 0 END AS new_session
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
), with_ids AS (
  SELECT user_id, ts_s,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_s,
                                      event_id ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, count(*) AS n_events,
       min(ts_s) AS session_start_s, max(ts_s) AS session_end_s
FROM with_ids GROUP BY user_id, session_idx
"""


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (batch form of the Structured
    Streaming windowed aggregation)."""
    ev = _events(spark, sf_dir)
    return (ev.withColumn("hour_bucket",
                          F.floor(F.unix_timestamp("ts") / 3600).cast("bigint"))
            .groupBy("hour_bucket", "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("value_sum")))


TUMBLING_COUNTS_SQL = """
SELECT CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 3600) AS BIGINT) AS hour_bucket,
       event_type, count(*) AS n_events, round(sum(value), 4) AS value_sum
FROM events GROUP BY 1, 2
"""


HOP_DURATION_S = 3600
HOP_SLIDE_S = 1800


def hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) 1-hour windows every 30 minutes per event type —
    the overlapping-window form of :func:`tumbling_counts` (each event
    lands in duration/slide = 2 windows).  Uses Spark's native
    ``F.window(ts, duration, slide)``; at scale this is one explode-free
    windowed hash aggregation."""
    ev = _events(spark, sf_dir)
    win = F.window("ts", f"{HOP_DURATION_S} seconds",
                   f"{HOP_SLIDE_S} seconds")
    return (ev.groupBy(win.alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("value_sum"))
            .select(F.unix_timestamp("win.start").alias("window_start_s"),
                    "event_type", "n_events", "value_sum"))


HOPPING_COUNTS_SQL = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type, value
  FROM events
), hopped AS (
  -- each event belongs to duration/slide = 2 hop-aligned windows
  SELECT (ts_s // {HOP_SLIDE_S}) * {HOP_SLIDE_S} - h.off AS window_start_s,
         event_type, value
  FROM ev, (VALUES (0), ({HOP_SLIDE_S})) h(off)
)
SELECT window_start_s, event_type, count(*) AS n_events,
       round(sum(value), 4) AS value_sum
FROM hopped GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# lag-window gap statistics
# ---------------------------------------------------------------------------

def event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics via a lag() window — the
    window-frame surface (ordered partition, offset function) reduced to
    one row per user.  One hash exchange on user_id; window state is
    bounded by the per-user event count."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.unix_timestamp("ts").alias("ts_s"), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    gaps = (ev.withColumn("gap_s", F.col("ts_s") - F.lag("ts_s").over(w))
            .filter(F.col("gap_s").isNotNull()))
    return (gaps.groupBy("user_id")
            .agg((F.count("*") + 1).alias("n_events"),
                 F.round(F.avg("gap_s"), 6).alias("avg_gap_s"),
                 F.max("gap_s").alias("max_gap_s")))


EVENT_GAP_STATS_SQL = """
WITH gaps AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
           AS gap_s
  FROM events
)
SELECT user_id, count(*) + 1 AS n_events,
       round(avg(gap_s), 6) AS avg_gap_s,
       max(gap_s) AS max_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY user_id
"""
