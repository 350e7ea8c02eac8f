"""Stream replay + run-to-completion utilities.

The reference's streaming surface is a micro-batch DStream fed by a
Kafka-API direct stream (``MapRStreamingSource.java:88-93``). The
engine's equivalent is Structured Streaming; for deterministic tests the
``events`` table is replayed through the file stream source (same
micro-batch execution path as Kafka, minus the broker).

``run_available_now`` executes a streaming DataFrame to the end of
available input (Trigger.AvailableNow — the bounded-reprocess trigger)
into a memory sink and returns the result as a batch DataFrame, so
streaming queries can participate in the oracle-differential gate.
"""

from __future__ import annotations

import hashlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapr_plugins_spark.session import pin_runtime_conf


def _stream_dir(sf_dir: str, name: str) -> str:
    """The file stream source requires a *directory*; the test tables are
    single read-only files. Stage a per-table symlink directory in /tmp
    (idempotent, content untouched)."""
    key = hashlib.md5(f"{sf_dir}/{name}".encode()).hexdigest()[:12]
    d = f"/tmp/mapr_plugins_stream/{key}"
    os.makedirs(d, exist_ok=True)
    link = f"{d}/{name}.parquet"
    if not os.path.lexists(link):
        os.symlink(f"{sf_dir}/{name}.parquet", link)
    return d


def as_event_time(df: DataFrame, col: str) -> DataFrame:
    """Convert a TIMESTAMP_NTZ column to a TIMESTAMP (instant) suitable
    for watermarks/window buckets, anchoring the naive wall time at UTC
    **independently of the session timezone**: wall-clock micros via
    NTZ-to-NTZ ``timestampdiff`` (pure calendar arithmetic, no zone),
    then ``timestamp_micros`` (absolute epoch, no zone). Watermarks
    reject NTZ ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]); a plain cast
    would shift by the session offset."""
    epoch_us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
    )
    return df.withColumn(col, F.timestamp_micros(epoch_us))


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` replayed as a stream (schema-pinned file source, with
    the same physical-type normalization as the batch catalog: shipped
    data is timestamp[us] → TIMESTAMP_NTZ pass-through; a LONG-nanos
    read would get the nanos→micros conversion)."""
    pin_runtime_conf(spark)
    from pyspark.sql.types import LongType, TimestampType

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(batch_schema)
        .parquet(_stream_dir(sf_dir, "events"))
    )
    ts_type = batch_schema["ts"].dataType
    if isinstance(ts_type, LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampType):
        raw = raw.withColumn("ts", F.expr("to_timestamp_ntz(ts)"))
    return raw


def events_stream_chunked(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> DataFrame:
    """``events`` replayed as ``n_chunks`` REAL incremental micro-batches:
    the table is staged once into n parquet chunk files (event_id mod n,
    ts pinned to UTC-wall NTZ) and streamed with maxFilesPerTrigger=1.

    Downstream folds must be order-independent (e.g. last-writer-wins by
    (ts, event_id)) — the file source picks files by modification time,
    which we set ascending, but correctness should not depend on it."""
    pin_runtime_conf(spark)
    key = hashlib.md5(f"{sf_dir}/events/chunks{n_chunks}".encode()).hexdigest()[:12]
    d = f"/tmp/mapr_plugins_stream/{key}"
    staged = f"{d}/_STAGED"
    if not os.path.exists(staged):
        os.makedirs(d, exist_ok=True)
        import glob as _glob
        import shutil

        from mapr_plugins_spark.catalog import table

        # catalog.table yields ts as TIMESTAMP_NTZ (naive wall time),
        # which Spark writes back as parquet timestamp[us]. Each chunk
        # is staged by a Spark write — no driver-side toPandas
        # materialization, so the stager itself scales with the table.
        ev = table(spark, sf_dir, "events")
        for i in range(n_chunks):
            tmp = f"{d}/_tmp{i}"
            (
                ev.filter(F.col("event_id") % n_chunks == i)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = _glob.glob(f"{tmp}/part-*.parquet")[0]
            os.replace(part, f"{d}/chunk{i}.parquet")
            shutil.rmtree(tmp)
            os.utime(f"{d}/chunk{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))
        with open(staged, "w") as f:
            f.write("ok")
    schema = spark.read.parquet(f"{d}/chunk0.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )


def df_stream_chunked(
    df: DataFrame, cache_key: str, order_col: str, n_chunks: int = 4
) -> DataFrame:
    """Replay an arbitrary DataFrame as ``n_chunks`` REAL incremental
    micro-batches: staged once into contiguous chunks along
    ``order_col`` (wave i = the i-th ntile — "arrival order" follows
    the key), mtimes ascending, streamed with maxFilesPerTrigger=1.
    Same contract as :func:`events_stream_chunked`: downstream folds
    must be order-independent; the staging global sort is test-harness
    scoped."""
    import glob as _glob
    import shutil

    from pyspark.sql import Window

    spark = df.sparkSession
    pin_runtime_conf(spark)
    key = hashlib.md5(f"{cache_key}/chunks{n_chunks}".encode()).hexdigest()[:12]
    d = f"/tmp/mapr_plugins_stream/{key}"
    staged = f"{d}/_STAGED"
    if not os.path.exists(staged):
        os.makedirs(d, exist_ok=True)
        chunked = df.withColumn(
            "__chunk", F.ntile(n_chunks).over(Window.orderBy(order_col))
        )
        for i in range(n_chunks):
            tmp = f"{d}/_tmp{i}"
            (
                chunked.filter(F.col("__chunk") == i + 1)
                .drop("__chunk")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = _glob.glob(f"{tmp}/part-*.parquet")[0]
            os.replace(part, f"{d}/chunk{i}.parquet")
            shutil.rmtree(tmp)
            os.utime(f"{d}/chunk{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))
        with open(staged, "w") as f:
            f.write("ok")
    schema = spark.read.parquet(f"{d}/chunk0.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )


def run_available_now(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink;
    return the sink contents as a batch DataFrame.

    Streaming disables AQE, so the state store materializes EVERY
    shuffle partition; on a host session left at the 200 default that is
    ~200 state-store instances per stateful op for test-sized data. Pin
    the partition count to the machine for the run, restore after —
    results are partitioning-independent, only the state layout changes.
    """
    spark = stream_df.sparkSession
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(spark.sparkContext.defaultParallelism))
    try:
        name = f"snap_{uuid.uuid4().hex[:12]}"
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, old)
    return spark.table(name)
