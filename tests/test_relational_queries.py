"""Oracle-differential tests for the declared relational query set.

Every (queries.py, oracles.py) pair is run at sf0.001 and compared via
the same canonicalize-and-compare the driver's t2 gate uses.
"""

from __future__ import annotations

import pytest

from mapr_plugins_spark import queries as Q
from mapr_plugins_spark.oracles import RELATIONAL_ORACLES

QUERY_FNS = {
    name: fn
    for name, fn in vars(Q).items()
    if callable(fn) and (name.startswith("q"))
}


def test_inventory_complete():
    """Every oracle key has a query fn and vice versa."""
    assert set(RELATIONAL_ORACLES) == set(QUERY_FNS)


@pytest.mark.parametrize("key", sorted(RELATIONAL_ORACLES))
def test_query_matches_oracle(spark, sf_dir, key):
    from tests.oracle_harness import assert_matches_oracle

    df = QUERY_FNS[key](spark, sf_dir)
    assert_matches_oracle(df, RELATIONAL_ORACLES[key], sf_dir, key=key)


def test_declared_schema_contract(spark, sf_dir):
    """Every test table's physical schema matches the declared DDL
    (reference §1.3: schemas are declared, drift fails at configure
    time)."""
    from mapr_plugins_spark.catalog import TABLES, validate_declared_schema

    for name in TABLES:
        validate_declared_schema(spark, sf_dir, name)


def test_declared_schema_drift_detected(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from mapr_plugins_spark import catalog as C

    bad = dict(C.DECLARED_SCHEMAS)
    bad["region"] = "r_regionkey BIGINT, r_name STRING"  # wrong width
    orig = C.DECLARED_SCHEMAS
    C.DECLARED_SCHEMAS = bad
    try:
        with _pytest.raises(ValueError, match="schema drift"):
            C.validate_declared_schema(spark, sf_dir, "region")
    finally:
        C.DECLARED_SCHEMAS = orig


def test_row_udf_api_parity(spark, sf_dir):
    """Row-at-a-time Python UDF API parity: same banding as the graded
    built-in q41, value-identical on every row. Kept as a unit test only
    — the row path is the documented anti-pattern for hot queries."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    from mapr_plugins_spark.catalog import table

    band_udf = F.udf(
        lambda b: "neg" if b < 0 else ("mid" if b < 5000 else "high"), StringType()
    )
    cust = table(spark, sf_dir, "customer")
    via_udf = cust.select("c_custkey", band_udf("c_acctbal").alias("bal_band"))
    builtin = Q.q41_row_udf(spark, sf_dir)
    assert via_udf.exceptAll(builtin).count() == 0
    assert builtin.exceptAll(via_udf).count() == 0


def test_q41_plan_has_no_python_row_path(spark, sf_dir):
    """The graded q41 plan must contain no Python eval operator."""
    plan = Q.q41_row_udf(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_driver_hashable_output_schemas(spark, sf_dir):
    """Every registered queries() output schema must be free of
    array/map/struct columns — the driver's canonicalizer hashes cell
    values via pandas and collection cells are unhashable — AND free of
    raw DATE columns: pandas materialization renders DuckDB DATE as a
    midnight Timestamp but Spark DATE as datetime.date, so a DATE
    column can never hash-match even when values agree (caught locally
    on q15/q49/x_cohort_retention in round 3). Dates go out as ISO
    strings."""
    import __spark_entry__ as E
    from pyspark.sql.types import ArrayType, DateType, MapType, StructType

    bad: list[str] = []
    for name, fn in E.queries().items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as exc:  # surfaced separately by oracle tests
            bad.append(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType, DateType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, "driver-hazardous graded outputs:\n" + "\n".join(bad)
