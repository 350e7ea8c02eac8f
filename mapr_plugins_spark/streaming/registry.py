"""Declared streaming queries (FIXTURES S01–S05) + batch SQL oracles.

Each query REALLY runs through Structured Streaming (micro-batch
execution, state store, watermarks) via Trigger.AvailableNow, then the
final state is compared against a batch-computed DuckDB equivalent —
the strongest cross-engine check available for streaming semantics.

Window starts are emitted as epoch microseconds (BIGINT) so no
timestamp formatting/timezone can leak into the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapr_plugins_spark.catalog import table as _t
from mapr_plugins_spark.streaming.replay import events_stream, run_available_now

_US_5MIN = 300_000_000


def s01_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window count by event_type, with watermark."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = ev.groupBy(F.window("ts", "5 minutes"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = run_available_now(agg, "complete")
    return out.select(
        F.unix_micros(F.col("window.start")).alias("ws_us"), "event_type", "n"
    )


def s02_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding by 5: exact-decimal sum + count + avg."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = ev.groupBy(F.window("ts", "10 minutes", "5 minutes")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        F.count(F.lit(1)).alias("n"),
    )
    out = run_available_now(agg, "complete")
    return out.select(
        F.unix_micros(F.col("window.start")).alias("ws_us"),
        F.col("sv").cast("double").alias("sum_val"),
        "n",
        (F.col("sv").cast("double") / F.col("n")).alias("avg_val"),
    )


def s03_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
    )
    out = run_available_now(agg, "complete")
    return out.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        "n_events",
        F.col("sv").cast("double").alias("sum_val"),
    )


def s04_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-injected replay (stream ∪ stream) → stateful
    dropDuplicates on event_id → counts by type."""
    ev = events_stream(spark, sf_dir)
    doubled = ev.unionByName(events_stream(spark, sf_dir))
    deduped = doubled.dropDuplicates(["event_id"])
    out = run_available_now(deduped, "append")
    return out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def s05_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⋈ static dimension (customer) + windowless aggregation."""
    ev = events_stream(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    out = run_available_now(agg, "complete")
    return out


def streaming_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        fn.__name__: fn
        for fn in (
            s01_tumbling_window,
            s02_sliding_window,
            s03_session_window,
            s04_stateful_dedup,
            s05_stream_static_join,
        )
    }


def streaming_oracles() -> dict[str, str]:
    return {
        "s01_tumbling_window": f"""
            SELECT (epoch_us(ts) // {_US_5MIN}) * {_US_5MIN} AS ws_us,
                   event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "s02_sliding_window": f"""
            WITH w AS (
                SELECT ((epoch_us(ts) // {_US_5MIN}) - k.k) * {_US_5MIN} AS ws_us, value
                FROM events CROSS JOIN (VALUES (0), (1)) k(k)
            )
            SELECT ws_us,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_val,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_val
            FROM w GROUP BY 1
        """,
        "s03_session_window": """
            WITH o AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                                        PARTITION BY user_id ORDER BY ts)) > 1800000000
                            THEN 1 ELSE 0 END AS new_s
                FROM events
            ),
            s AS (
                SELECT *, SUM(new_s) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
                FROM o
            )
            SELECT user_id,
                   epoch_us(MIN(ts)) AS session_start_us,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_val
            FROM s GROUP BY user_id, sid
        """,
        "s04_stateful_dedup": """
            SELECT event_type, COUNT(*) AS n
            FROM (SELECT DISTINCT event_id, event_type FROM events)
            GROUP BY event_type
        """,
        "s05_stream_static_join": """
            SELECT c_mktsegment, COUNT(*) AS n
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY c_mktsegment
        """,
    }
