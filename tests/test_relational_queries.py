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
