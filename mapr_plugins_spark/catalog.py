"""Table catalog: named parquet tables registered as temp views.

Mirrors the reference's external-dataset registration
(``ReferenceStreamingSource.java:44`` — ``createDataset(referenceName,
EXTERNAL_DATASET_TYPE)``) as Spark catalog temp views: the engine's
handle to a dataset is a name, resolution happens at plan analysis.

Scale note: each table is a plain ``spark.read.parquet`` scan — column
pruning and predicate pushdown reach the parquet reader via Catalyst, so
a query touching 2 of 11 lineitem columns reads 2 column chunks, not 11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapr_plugins_spark.session import pin_runtime_conf

#: The driver's test tables (TESTDATA.md): TPC-H-ish star schema plus
#: events / documents / embeddings extension tables.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Declared (user-facing) DDL schema per table — the reference's
#: explicit-schema contract (§1.3: schemas are declared, not inferred;
#: ``Schema.parseJson`` at configure time, ``MapRStreamConfig.java:81-87``).
#: ``validate_declared_schema`` is the engine's configure-time
#: equivalent of the reference's parse-failure ⇒ IllegalArgumentException.
DECLARED_SCHEMAS: dict[str, str] = {
    "region": "r_regionkey INT, r_name STRING",
    "nation": "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING"
    ),
    "supplier": "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
    "part": (
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"
    ),
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP_NTZ"
    ),
    # events.ts: the shipped parquet stores timestamp[us] (no timezone),
    # which Spark 4 reads as TIMESTAMP_NTZ. _read normalizes the one
    # alternative physical encoding (INT64 nanos read as LONG) to the
    # same NTZ type, so this declared contract holds either way. Values
    # are wall-time-stable: NTZ carries no zone and the session timezone
    # is pinned UTC for any cast boundary.
    "events": (
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    ),
    "documents": "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
}


def validate_declared_schema(spark: SparkSession, sf_dir: str, name: str) -> None:
    """Fail at configure time if a table's physical schema drifted from
    the declared contract (name/type mismatch, missing/extra columns)."""
    from pyspark.sql.types import StructType

    declared = StructType.fromDDL(DECLARED_SCHEMAS[name])
    actual = _read(spark, sf_dir, name).schema
    got = [(f.name, f.dataType.simpleString()) for f in actual.fields]
    want = [(f.name, f.dataType.simpleString()) for f in declared.fields]
    if got != want:
        raise ValueError(
            f"schema drift for table {name!r}: declared {want}, found {got}"
        )


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table, normalizing physical quirks of the test parquet.

    ``events.parquet`` ships ``ts`` as parquet ``timestamp[us]`` (no
    zone), which Spark 4 loads directly as TIMESTAMP_NTZ — the common
    case is a straight pass-through. The one alternative encoding seen
    in the wild for this dataset is TIMESTAMP(NANOS), which Spark's
    vectorized reader surfaces as LONG nanos only under
    ``spark.sql.legacy.parquet.nanosAsLong``; we branch on the *actual
    loaded type* and floor-divide nanos→micros in that case (the same
    truncation DuckDB applies narrowing TIMESTAMP_NS), so both engines
    see identical microsecond values either way.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # INT64-nanos physical encoding (nanosAsLong sessions only).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampType):
            # TIMESTAMP_LTZ read: re-anchor to the NTZ contract (session
            # tz is pinned UTC, so this is a type change, not a shift).
            df = df.withColumn("ts", F.expr("to_timestamp_ntz(ts)"))
        # TIMESTAMP_NTZ: pass through — matches DECLARED_SCHEMAS.
    return df


def load_tables(spark: SparkSession, sf_dir: str, register_views: bool = True) -> dict[str, DataFrame]:
    """Load every test table from ``sf_dir`` and register temp views.

    Returns ``{name: DataFrame}``. Safe to call repeatedly (views are
    replaced). Also pins runtime-mutable engine configs (UTC timezone,
    AQE) on the session so results are deterministic regardless of who
    created the session.
    """
    pin_runtime_conf(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = _read(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a single test table (no view registration). Pins the same
    runtime conf as :func:`load_tables` — single-table entry points get
    identical timezone/AQE/shuffle sizing on a host-created session."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    pin_runtime_conf(spark)
    return _read(spark, sf_dir, name)
