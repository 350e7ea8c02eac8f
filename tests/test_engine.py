"""The SURVEY §3.4 facade: sql() and the DataFrame API must plan into
the same Catalyst pipeline and produce identical results over the
catalog-normalized views."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapr_plugins_spark.engine import Engine


def test_sql_and_dataframe_api_agree(spark, sf_dir):
    eng = Engine(sf_dir, spark=spark)
    via_sql = eng.sql(
        "SELECT l_returnflag, CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty "
        "FROM lineitem GROUP BY l_returnflag"
    )
    via_df = (
        eng.table("lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(map(tuple, via_df.collect()))


def test_engine_views_are_catalog_normalized(spark, sf_dir):
    """engine.sql must see the same events.ts type the batch catalog
    yields (TIMESTAMP_NTZ regardless of the physical encoding)."""
    eng = Engine(sf_dir, spark=spark)
    t = dict(eng.sql("SELECT ts FROM events").dtypes)["ts"]
    assert t == "timestamp_ntz", t


def test_engine_runs_registry_keys(spark, sf_dir):
    eng = Engine(sf_dir, spark=spark)
    assert eng.query("q22_exact_dedup").count() == eng.table("documents").count()
    assert eng.keys()[:1] == ["q01_filter_project"]


def test_engine_rejects_unknown(spark, sf_dir):
    import pytest

    eng = Engine(sf_dir, spark=spark)
    with pytest.raises(KeyError):
        eng.table("nope")
    with pytest.raises(KeyError):
        eng.query("nope")


def test_engine_audit_reports_plan_quality(spark, sf_dir):
    """audit() must surface the plan facts the plan tests pin: the
    broadcast-join query shows a broadcast and no cartesian; a pushed
    filter shows up for a filtered scan; PQ encode shows zero shuffles
    and zero Python stages."""
    from mapr_plugins_spark.engine import Engine

    eng = Engine(sf_dir, spark=spark)
    a = eng.audit("q04_broadcast_join")
    assert a["broadcast_join"] and not a["cartesian"]
    b = eng.audit(eng.table("lineitem").filter("l_quantity < 5").select("l_orderkey"))
    assert "l_quantity" in b["pushed_filters"]
    c = eng.audit("x_embed_pq_encode")
    assert c["shuffles"] == 0 and c["python_stages"] == 0


def test_engine_audit_counts_every_python_stage_kind(spark, sf_dir):
    """audit() must see ALL Python-executing physical nodes, not just
    the eval-UDF ones: applyInPandas (FlatMapGroupsInPandas),
    mapInPandas, and mapInArrow each count."""
    import pandas as pd

    from mapr_plugins_spark.engine import Engine

    eng = Engine(sf_dir, spark=spark)
    base = eng.table("nation").select("n_nationkey", "n_regionkey")

    grouped = base.groupBy("n_regionkey").applyInPandas(
        lambda pdf: pdf.head(1), schema="n_nationkey INT, n_regionkey INT"
    )
    assert eng.audit(grouped)["python_stages"] >= 1

    def _ident(it):
        yield from it

    assert eng.audit(base.mapInPandas(_ident, base.schema))["python_stages"] >= 1
    assert eng.audit(base.mapInArrow(_ident, base.schema))["python_stages"] >= 1
