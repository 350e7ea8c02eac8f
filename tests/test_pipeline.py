"""End-to-end tests for the config-driven pipeline facade.

The golden case is the reference's own documented example: csv purchase
events parsed into a typed record and written as keyed JSON documents
(docs/MapRStream-streamingsource.md:31-69 → docs/MapRDBJSON-batchsink.md).
"""

from __future__ import annotations

import json

import pytest

from mapr_plugins_spark.pipeline import (
    PipelineSpec,
    resolve_macros,
    run_batch,
    run_stream,
)

PURCHASE_SCHEMA = "user STRING, item STRING, count INT, price DOUBLE"
PAYLOADS = "alice,coffee,2,5.50\nbob,donut,3,1.25\ncarol,tea,1,2.00\n"


def _spec(tmp_path, **kw):
    return PipelineSpec.from_properties(
        {
            "referenceName": "purchases",
            "topics": "purchases",
            "defaultInitialOffset": "earliest",
            "format": "csv",
            "schema": PURCHASE_SCHEMA,
        },
        {"tableName": str(tmp_path / "purchase_docs"), "key": "user"},
        **kw,
    )


def test_macro_resolution():
    props = {"topics": "${topic}", "schema": PURCHASE_SCHEMA}
    out = resolve_macros(props, {"topic": "purchases"})
    assert out["topics"] == "purchases"
    with pytest.raises(ValueError, match="unresolved macro"):
        resolve_macros({"topics": "${nope}"}, {})


def test_from_properties_validation(tmp_path):
    with pytest.raises(ValueError, match="unknown format"):
        PipelineSpec.from_properties(
            {"topics": "t", "format": "yaml"}, {"tableName": "x", "key": "k"}
        )
    with pytest.raises(ValueError, match="tableName"):
        PipelineSpec.from_properties({"topics": "t"}, {"key": "k"})
    with pytest.raises(ValueError, match="key"):
        PipelineSpec.from_properties({"topics": "t"}, {"tableName": "x"})
    with pytest.raises(ValueError, match="offset policy"):
        PipelineSpec.from_properties(
            {"topics": "t", "defaultInitialOffset": "middle"},
            {"tableName": "x", "key": "k"},
        )


def test_batch_pipeline_end_to_end(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "events.txt").write_text(PAYLOADS)
    spec = _spec(tmp_path, filters=["count >= 2"])
    metrics = run_batch(spark, spec, str(d))
    assert metrics == {"rows_in": 3, "rows_out": 2}  # executor-side observe

    rows = spark.read.parquet(str(tmp_path / "purchase_docs")).orderBy("_id").collect()
    assert [r["_id"] for r in rows] == ["alice", "bob"]  # carol filtered out
    doc = json.loads(rows[0]["doc"])
    assert doc == {"user": "alice", "item": "coffee", "count": 2, "price": 5.5}


def test_stream_pipeline_end_to_end(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "events.txt").write_text(PAYLOADS)
    spec = _spec(
        tmp_path,
        filters=["price > 1.0"],
        select=["user", "item", "count * price AS total"],
    )
    q = run_stream(
        spark,
        spec,
        checkpoint_dir=str(tmp_path / "ckpt"),
        replay_dir=str(d),
        query_name="pipeline_test",
    )
    q.awaitTermination()

    rows = spark.read.parquet(str(tmp_path / "purchase_docs")).orderBy("_id").collect()
    got = {r["_id"]: json.loads(r["doc"]) for r in rows}
    assert got == {
        "alice": {"user": "alice", "item": "coffee", "total": 11.0},
        "bob": {"user": "bob", "item": "donut", "total": 3.75},
        "carol": {"user": "carol", "item": "tea", "total": 2.0},
    }

    # restart with the same checkpoint: no new input ⇒ no duplicate docs
    q2 = run_stream(
        spark,
        spec,
        checkpoint_dir=str(tmp_path / "ckpt"),
        replay_dir=str(d),
        query_name="pipeline_test",
    )
    q2.awaitTermination()
    assert spark.read.parquet(str(tmp_path / "purchase_docs")).count() == 3
