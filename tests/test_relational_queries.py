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
