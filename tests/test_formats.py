"""Format registry (reference A4) + stream-source shim (A1) unit tests.

The csv golden case is the reference's documented purchase example
(``/root/reference/docs/MapRStream-streamingsource.md:31-69``): payload
``alice,coffee,2,5.50`` with schema (user, item, count, price).
"""

from __future__ import annotations

import pytest

from mapr_plugins_spark.sources.formats import (
    CLF_REGEX,
    FORMATS,
    grok_compile,
    parse_expr,
)
from mapr_plugins_spark.sources.stream import (
    StreamSourceSpec,
    open_stream,
    parsed_stream,
    reader_options,
)

from pyspark.sql import functions as F


def test_csv_golden_purchase_example(spark):
    df = spark.createDataFrame(
        [(b"alice,coffee,2,5.50",), (b"bob,cof\xc3\xa9fee,3,2.05",)], "value binary"
    )
    rec = parse_expr("csv", F.col("value"), "user STRING, item STRING, count INT, price DOUBLE")
    rows = df.select(rec.alias("r")).select("r.*").orderBy("user").collect()
    assert [tuple(r) for r in rows] == [
        ("alice", "coffee", 2, 5.50),
        ("bob", "coféfee", 3, 2.05),
    ]


def test_tsv_and_text_and_binary(spark):
    df = spark.createDataFrame([(b"a\t1",)], "value binary")
    rec = parse_expr("tsv", F.col("value"), "s STRING, i INT")
    assert df.select(rec.alias("r")).select("r.*").first()[:] == ("a", 1)
    assert df.select(parse_expr("text", F.col("value")).alias("t")).first()["t"] == "a\t1"
    assert df.select(parse_expr(None, F.col("value")).alias("b")).first()["b"] == b"a\t1"


def test_clf_golden_line(spark):
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    df = spark.createDataFrame([(line,)], "value string")
    r = df.select(parse_expr("clf", F.col("value")).alias("r")).select("r.*").first()
    assert r["host"] == "127.0.0.1"
    assert r["authuser"] == "frank"
    assert r["ts"] == "10/Oct/2000:13:55:36 -0700"
    assert r["request"] == "GET /apache_pb.gif HTTP/1.0"
    assert r["status"] == "200"
    assert r["bytes"] == "2326"


def test_syslog_golden_line(spark):
    line = "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed for lonvick"
    df = spark.createDataFrame([(line,)], "value string")
    r = df.select(parse_expr("syslog", F.col("value")).alias("r")).select("r.*").first()
    assert r["pri"] == "34"
    assert r["host"] == "mymachine"
    assert r["tag"] == "su"
    assert r["pid"] == "230"
    assert r["msg"] == "'su root' failed for lonvick"


def test_grok_compile_and_parse(spark):
    regex, fields = grok_compile("%{IP:client} %{WORD:method} %{NUMBER:bytes}")
    assert fields == ["client", "method", "bytes"]
    df = spark.createDataFrame([("10.0.0.1 GET 123.4",)], "value string")
    r = (
        df.select(
            parse_expr(
                "grok", F.col("value"), grok_pattern="%{IP:client} %{WORD:method} %{NUMBER:bytes}"
            ).alias("r")
        )
        .select("r.*")
        .first()
    )
    assert tuple(r) == ("10.0.0.1", "GET", "123.4")


def test_grok_unnamed_and_unknown():
    regex, fields = grok_compile("%{IP} - %{WORD:w}")
    assert fields == ["w"]
    with pytest.raises(KeyError):
        grok_compile("%{NOPE:x}")


def test_format_errors():
    with pytest.raises(ValueError):
        parse_expr("csv", F.lit("x"))  # schema required
    with pytest.raises(ValueError):
        parse_expr("nope", F.lit("x"))
    assert "csv" in FORMATS and "grok" in FORMATS


def test_reader_options_a1_semantics():
    """Pin the EXACT Kafka option dict per A1 semantics
    (MapRStreamingSource.java:70-94: subscribe list, initial-offset
    policy, consumer group, no auto-commit)."""
    import hashlib

    spec = StreamSourceSpec(topics="t1, t2", offset_policy="earliest",
                            brokers="b1:9092,b2:9092")
    opts = reader_options(spec, query_name="q")
    want_group = f"q-{hashlib.md5(b't1, t2').hexdigest()[:8]}"
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "t1,t2",
        "startingOffsets": "earliest",
        "kafka.group.id": want_group,
        "kafka.enable.auto.commit": "false",
    }
    # group id is stable across processes (md5, not salted hash()) and
    # distinct per query name / topic set
    assert reader_options(spec, query_name="q")["kafka.group.id"] == want_group
    assert reader_options(spec, query_name="r")["kafka.group.id"] != want_group
    other = StreamSourceSpec(topics="t3", offset_policy="earliest")
    assert reader_options(other, query_name="q")["kafka.group.id"] != want_group
    # user options pass through and may override
    spec2 = StreamSourceSpec(topics="t", options={"maxOffsetsPerTrigger": "500"})
    assert reader_options(spec2)["maxOffsetsPerTrigger"] == "500"
    assert reader_options(spec2)["startingOffsets"] == "latest"  # ref default
    with pytest.raises(ValueError):
        StreamSourceSpec(topics="t", offset_policy="middle")
    with pytest.raises(ValueError):
        StreamSourceSpec(topics="")


def test_kafka_reader_path_executes_option_mapping(spark):
    """Execute the format('kafka') branch of open_stream — not just the
    dict builder. With the kafka connector jar on the classpath the
    load must succeed and present the Kafka row shape; without it (this
    sandbox ships no spark-sql-kafka jar, no network) the load must
    fail with the documented missing-data-source error, proving the
    options actually reached a Kafka reader build."""
    spec = StreamSourceSpec(topics="t1", offset_policy="earliest")
    try:
        df = open_stream(spark, spec)
    except Exception as exc:
        msg = str(exc)
        assert "kafka" in msg.lower(), f"unexpected failure: {msg[:200]}"
        return
    cols = set(df.columns)
    assert {"key", "value", "topic", "partition", "offset"} <= cols


def test_stream_replay_csv_end_to_end(spark, tmp_path):
    """A1+A4 end to end through real Structured Streaming micro-batches:
    file-replayed payloads parsed by the csv format projection."""
    d = tmp_path / "payloads"
    d.mkdir()
    (d / "p.txt").write_text("alice,coffee,2,5.50\nbob,donut,3,1.25\n")
    spec = StreamSourceSpec(
        topics="purchases",
        fmt="csv",
        schema="user STRING, item STRING, count INT, price DOUBLE",
    )
    src = open_stream(spark, spec, replay_dir=str(d), replay_schema="value STRING")
    parsed = parsed_stream(src, spec)
    q = (
        parsed.writeStream.format("memory")
        .queryName("fmt_replay")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("fmt_replay").orderBy("user").collect()
    assert [(r["user"], r["item"], r["count"], r["price"]) for r in rows] == [
        ("alice", "coffee", 2, 5.50),
        ("bob", "donut", 3, 1.25),
    ]
    assert rows[0]["topic"] == "purchases"


def test_batch_file_scans_roundtrip(spark, sf_dir, tmp_path):
    """Part B file scans: region written to csv/json/text and read back
    through the corresponding batch readers with declared schemas
    (schema inference stays off — the reference's contract)."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.catalog import table

    region = table(spark, sf_dir, "region").orderBy("r_regionkey")
    expected = [(r["r_regionkey"], r["r_name"]) for r in region.collect()]
    ddl = "r_regionkey INT, r_name STRING"

    csv_p = str(tmp_path / "region_csv")
    region.write.option("header", "true").csv(csv_p)
    got = spark.read.schema(ddl).option("header", "true").csv(csv_p).orderBy("r_regionkey")
    assert [(r[0], r[1]) for r in got.collect()] == expected

    json_p = str(tmp_path / "region_json")
    region.write.json(json_p)
    got = spark.read.schema(ddl).json(json_p).orderBy("r_regionkey")
    assert [(r[0], r[1]) for r in got.collect()] == expected

    txt_p = str(tmp_path / "region_txt")
    region.select(
        F.concat_ws("|", F.col("r_regionkey").cast("string"), "r_name").alias("value")
    ).write.text(txt_p)
    got = (
        spark.read.text(txt_p)
        .select(F.split("value", r"\|").alias("p"))
        .select(
            F.element_at("p", 1).cast("int").alias("r_regionkey"),
            F.element_at("p", 2).alias("r_name"),
        )
        .orderBy("r_regionkey")
    )
    assert [(r[0], r[1]) for r in got.collect()] == expected


def test_binary_file_scan(spark, tmp_path):
    """binaryFile reader: whole-file payloads as (path, content BINARY) —
    the batch ingestion shape for multimodal blobs."""
    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload")
    got = spark.read.format("binaryFile").load(str(tmp_path)).select("content").collect()
    assert got[0]["content"] == b"\x00\x01payload"


def test_xml_format_parse(spark):
    """Engine-extension XML payload format (Spark 4 native from_xml)."""
    from pyspark.sql import functions as F

    from mapr_plugins_spark.sources.formats import parse_expr

    df = spark.createDataFrame(
        [(b"<rec><user>alice</user><item>coffee</item><count>2</count></rec>",)],
        "value binary",
    )
    parsed = df.select(
        parse_expr("xml", F.col("value"), "user STRING, item STRING, count INT").alias("r")
    ).select("r.*")
    assert parsed.collect()[0].asDict() == {"user": "alice", "item": "coffee", "count": 2}


def test_avro_gate_is_accurate(spark):
    """Executable documentation of the avro classpath status: if the
    spark-avro connector is loaded, the avro format must round-trip a
    golden record; if not (this sandbox ships only avro core jars, no
    spark-avro_2.13, and has no network), building on the parse expr
    must fail with the documented analysis error — not silently wrong
    data. Either way the gate's answer matches observed behavior."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mapr_plugins_spark.sources.formats import avro_available, parse_expr

    schema = (
        '{"type":"record","name":"r","fields":[{"name":"id","type":"long"}]}'
    )
    if avro_available(spark):
        from pyspark.sql.avro.functions import to_avro

        enc = spark.range(3).select(to_avro(F.struct("id")).alias("value"))
        out = enc.select(parse_expr("avro", "value", schema).alias("d"))
        assert sorted(r["d"]["id"] for r in out.collect()) == [0, 1, 2]
    else:
        enc = spark.range(3).select(F.encode(F.col("id").cast("string"), "utf-8").alias("value"))
        with _pytest.raises(Exception, match="AVRO_NOT_LOADED|avro"):
            enc.select(parse_expr("avro", "value", schema).alias("d")).collect()


import pytest as _pt

from mapr_plugins_spark.sources import registry as _FR


@_pt.mark.parametrize("key", sorted(_FR.format_oracles()))
def test_format_query_matches_oracle(spark, sf_dir, key):
    """Every format-registry query vs its DuckDB oracle at sf0.001 —
    same differential the driver runs, so all four parse keys are
    pytest-gated each round (the driver's window grades only q26)."""
    from tests.oracle_harness import assert_matches_oracle

    df = _FR.format_queries()[key](spark, sf_dir)
    assert_matches_oracle(df, _FR.format_oracles()[key], sf_dir, key=key)


def test_warc_parse_golden(spark):
    """Hand-written WARC records (ISO 28500 layout): full response
    record, minimal record with missing headers (-> '' fields, NULL
    content_length), and a payload containing a blank LF-only line
    (must NOT split the header early — the separator is CRLFCRLF)."""
    from mapr_plugins_spark.sources.formats import parse_expr

    full = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Record-ID: <urn:uuid:abc-123>\r\n"
        "WARC-Target-URI: http://example.com/page\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "Content-Length: 11\r\n"
        "\r\n"
        "hello world"
    )
    minimal = "WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\npayload only"
    tricky = (
        "WARC/1.1\r\nWARC-Type: resource\r\nContent-Length: 9\r\n\r\n"
        "a\n\nb\r\n\r\nc"
    )
    df = (
        spark.createDataFrame([(full,), (minimal,), (tricky,)], "value STRING")
        .select(parse_expr("warc").alias("r"))
        .select("r.*")
    )
    rows = df.collect()
    r0, r1, r2 = rows
    assert (r0.version, r0.warc_type, r0.target_uri) == (
        "1.0", "response", "http://example.com/page"
    )
    assert r0.record_id == "<urn:uuid:abc-123>"
    assert r0.content_length == 11 and r0.payload == "hello world"
    assert r1.warc_type == "warcinfo"
    assert r1.target_uri == "" and r1.content_length is None
    assert r1.payload == "payload only"
    assert r2.version == "1.1"
    # split happens at the FIRST CRLFCRLF only: an LF-only blank line
    # and a later CRLFCRLF inside the payload must survive verbatim
    assert r2.payload == "a\n\nb\r\n\r\nc"
    assert r2.content_length == 9


def test_orc_batch_scan_roundtrip(spark, sf_dir, tmp_path):
    """ORC batch sink + scan (Spark-native columnar alternative to
    parquet — some warehouses standardize on it): full-table write/read
    identity for a typed table including timestamp columns, with the
    declared-schema contract (no inference)."""
    from mapr_plugins_spark.catalog import table

    orders = table(spark, sf_dir, "orders")
    p = str(tmp_path / "orders_orc")
    orders.write.orc(p)
    got = spark.read.schema(orders.schema).orc(p)
    assert got.schema == orders.schema
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b


def test_q74_csv_corrupt_accounting_laws(spark, sf_dir):
    """Hostile-csv contract (Q74): exactly the injected rows (key
    truncated at %7, non-numeric key at %11) are flagged corrupt;
    PERMISSIVE keeps the partially-parsed name/seg on every corrupt
    row; valid rows round-trip their key."""
    from mapr_plugins_spark.sources.registry import q74_csv_corrupt

    rows = q74_csv_corrupt(spark, sf_dir).collect()
    assert rows
    for r in rows:
        expect_corrupt = r.c_custkey % 7 == 0 or r.c_custkey % 11 == 0
        assert r.is_corrupt == expect_corrupt, r
        assert r.p_name is not None and r.p_seg is not None, r
        if not expect_corrupt:
            assert r.p_key == r.c_custkey, r
        else:
            assert r.p_key is None, r
