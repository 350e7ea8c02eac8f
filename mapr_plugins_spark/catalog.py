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


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table, normalizing physical quirks of the test parquet.

    ``events.parquet`` stores its ``ts`` column as parquet
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    ([PARQUET_TYPE_ILLEGAL]). We read nanos as LONG
    (``spark.sql.legacy.parquet.nanosAsLong``) and floor-divide to
    microseconds — the same truncation DuckDB applies when it narrows
    TIMESTAMP_NS to its microsecond TIMESTAMP, so both engines see
    identical values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
    """Load a single test table (no view registration)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return _read(spark, sf_dir, name)
