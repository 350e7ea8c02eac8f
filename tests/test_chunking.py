"""Chunking + sequence-packing invariants (operators/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapr_plugins_spark.operators.chunking import chunk_tokens, pack_sequences


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


def test_chunks_cover_all_tokens_exactly(spark):
    texts = ["a b c d e f g h i j k", "x y", "", "one two three four five"]
    out = chunk_tokens(_docs(spark, texts), max_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        # stride-3 starts, each chunk is the slice at its start
        for r in chunks:
            assert r["start_tok"] == r["chunk_id"] * 3
            want = toks[r["start_tok"] : r["start_tok"] + 4]
            assert r["chunk_text"].split() == want
            assert r["n_tokens"] == len(want)
        # concatenating de-overlapped chunks reconstructs the doc
        rebuilt = []
        for j, r in enumerate(chunks):
            ws = r["chunk_text"].split()
            rebuilt.extend(ws if j == 0 else ws[1:])
        assert rebuilt == toks


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_tokens(_docs(spark, ["a"]), max_tokens=4, overlap=4)


def test_packing_invariants(spark, sf_dir):
    from mapr_plugins_spark.catalog import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    budget = 256
    out = pack_sequences(docs, budget=budget, n_buckets=8)
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc packed exactly once

    fills = (
        out.groupBy("bucket", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        # a bin exceeds budget only as a single oversized doc
        assert r["fill"] <= budget or r["n"] == 1
    # packing is useful: average bin fill beats half the budget
    multi = [r["fill"] for r in fills]
    assert sum(multi) / len(multi) > budget / 2

    # bins are contiguous id-runs within each bucket
    by_bucket = {}
    for r in sorted(rows, key=lambda r: (r["bucket"], r["doc_id"])):
        by_bucket.setdefault(r["bucket"], []).append(r["bin_id"])
    for bins in by_bucket.values():
        assert bins == sorted(bins)
