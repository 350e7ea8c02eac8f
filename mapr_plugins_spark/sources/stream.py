"""Kafka-API stream source spec — the reference's A1 operator, Spark-first.

The reference subscribes to comma-separated topics through the Kafka 0.9
consumer API with an earliest/latest initial-offset policy, a random
consumer group, and 1 s auto-commit
(``MapRStreamingSource.java:70-94``, config at
``MapRStreamConfig.java:30-57``). Its payload is ``(byte[] key,
byte[] value)`` parsed by the A4 format registry.

The engine equivalent is Structured Streaming's Kafka source — the same
direct (receiver-less, partition-aligned) consumption model the
reference uses, with three deliberate semantic upgrades (SURVEY §1.4 /
§3.2): offsets tracked in the checkpoint WAL instead of consumer
auto-commit (exactly-once with idempotent sinks, vs at-least-once),
a deterministic group id per query instead of ``new Random().nextInt``
(``MapRStreamingSource.java:74``), and explicit Kafka metadata columns
(key/value/topic/partition/offset/timestamp) instead of the
first-field-is-the-message quirk (``MapRStreamingSource.java:134-140``).

No broker exists in the test environment, so ``reader_options`` (pure
config mapping) is unit-tested directly and ``open_stream`` accepts a
file-replay path that exercises the identical downstream parse plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapr_plugins_spark.sources.formats import parse_expr

#: Canonical initial-offset policies (Structured Streaming vocabulary).
OFFSET_POLICIES = ("earliest", "latest")

#: The reference's documented value vocabulary is ``beginning``/``latest``,
#: case-insensitive (``MapRStreamConfig.java:42-44`` Description
#: "Beginning/Latest", ``MapRStreamingSource.java:80-84``
#: ``equalsIgnoreCase("beginning")`` → auto.offset.reset=earliest,
#: widget values ``widgets/MapRStream-streamingsource.json:32-35``).
#: ``beginning`` maps to Spark's ``earliest``; unknown values are a
#: loud configure-time error rather than the reference's silent
#: fall-through to latest — the §1.4 fail-fast upgrade.
_OFFSET_ALIASES = {"beginning": "earliest", "earliest": "earliest", "latest": "latest"}


def normalize_offset_policy(value: str) -> str:
    """Map a reference-vocabulary offset value to the canonical policy,
    case-insensitively; raise on anything outside the documented surface."""
    canon = _OFFSET_ALIASES.get(str(value).strip().lower())
    if canon is None:
        raise ValueError(
            f"offset policy must be one of beginning/earliest/latest "
            f"(case-insensitive), got {value!r}"
        )
    return canon


@dataclass(frozen=True)
class StreamSourceSpec:
    """Mirrors ``MapRStreamConfig`` (broker/topics/offset/format/schema)."""

    topics: str  # comma-separated, as in the reference config
    brokers: str = "localhost:9092"
    offset_policy: str = "latest"  # reference default: latest
    fmt: str | None = None  # None = raw bytes (A3), else A4 format name
    schema: str | None = None  # DDL schema for record-shaped formats
    grok_pattern: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        # Normalize the reference's case-insensitive beginning|latest
        # vocabulary to the canonical earliest|latest; unknown → loud error.
        object.__setattr__(self, "offset_policy", normalize_offset_policy(self.offset_policy))
        if not self.topics:
            raise ValueError("topics must be non-empty")


def reader_options(spec: StreamSourceSpec, query_name: str = "mapr-plugins") -> dict[str, str]:
    """Kafka reader options for a spec — the A1 ``kafkaParams`` mapping
    (``MapRStreamingSource.java:73-86``) re-expressed for the Structured
    Streaming source."""
    import hashlib

    # deterministic group per (query, topics) — stable across processes
    # (Python's builtin hash() is salted per run; md5 is not) — vs the
    # reference's new Random().nextInt group
    topic_tag = hashlib.md5(spec.topics.encode()).hexdigest()[:8]
    return {
        "kafka.bootstrap.servers": spec.brokers,
        "subscribe": ",".join(t.strip() for t in spec.topics.split(",") if t.strip()),
        "startingOffsets": spec.offset_policy,
        "kafka.group.id": f"{query_name}-{topic_tag}",
        # offsets live in the checkpoint WAL; never auto-commit
        "kafka.enable.auto.commit": "false",
        **spec.options,
    }


def open_stream(
    spark: SparkSession,
    spec: StreamSourceSpec,
    *,
    replay_dir: str | None = None,
    replay_schema: str | None = None,
    maprstream_path: str | None = None,
) -> DataFrame:
    """Open the source as a streaming DataFrame of Kafka-shaped rows
    ``(key BINARY, value BINARY, topic, partition, offset, timestamp)``.

    Three physical backends behind one row shape: the Kafka source
    (production), the registered ``maprstream`` Python DataSource
    (``maprstream_path`` — real per-partition offsets, earliest/latest,
    admission control; sources/pyds.py), or a text-file replay directory
    (``replay_dir``, one payload per line). The downstream parse plan is
    identical in all three.
    """
    if maprstream_path is not None:
        from mapr_plugins_spark.sources.pyds import register

        register(spark)
        raw = (
            spark.readStream.format("maprstream")
            .option("path", maprstream_path)
            .option("topics", spec.topics)
            .option("startingOffsets", spec.offset_policy)
            .load()
        )
        return raw.select(
            "key",
            "value",
            "topic",
            "partition",
            "offset",
            F.timestamp_millis(F.col("timestamp_ms")).alias("timestamp"),
        )
    if replay_dir is None:
        reader = spark.readStream.format("kafka")
        for k, v in reader_options(spec).items():
            reader = reader.option(k, v)
        return reader.load()
    raw = spark.readStream.format("text")
    if replay_schema:
        raw = raw.schema(replay_schema)
    lines = raw.load(replay_dir)
    first_topic = spec.topics.split(",")[0].strip()
    return lines.select(
        F.lit(None).cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(first_topic).alias("topic"),
        F.spark_partition_id().alias("partition"),
        # real offsets are Kafka bookkeeping; the replay source has none
        F.lit(-1).cast("bigint").alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )


def parsed_stream(source: DataFrame, spec: StreamSourceSpec) -> DataFrame:
    """Apply the A4 format projection to a Kafka-shaped stream: the
    reference's per-batch ``RecordTransform``
    (``MapRStreamingSource.java:99-114``) collapsed into a single
    codegen'd projection."""
    parsed = parse_expr(
        spec.fmt,
        F.col("value"),
        spec.schema,
        grok_pattern=spec.grok_pattern,
        options=spec.options or None,
    )
    if spec.fmt in (None, "binary", "text"):
        return source.select(parsed.alias("message"), "topic", "partition", "offset", "timestamp")
    return source.select(
        parsed.alias("record"), "topic", "partition", "offset", "timestamp"
    ).select("record.*", "topic", "partition", "offset", "timestamp")
