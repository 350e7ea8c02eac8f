"""Deterministic scale-up generator: sfX -> FACTOR * sfX inside the repo.

The driver ships sf0.001/0.01/0.1 only; the 100 TB argument rests on
SCALE.md's sf-curves, which topped out at sf0.1 through round 6. This
builds an sf1-equivalent dataset (10x sf0.1) the engine can be probed
against WITHOUT touching /root/testdata (read-only) — every scale
claim gains one more measured decade.

Construction: FACTOR disjoint key-shifted replicas of the source
universe — the same scaling law TPC-H itself uses (more customers /
orders / parts at the same per-key density), so join cardinalities,
group counts and graph degree distributions grow linearly and a
perfectly scale-free operator should show ~FACTOR x cost.

Two columns get deterministic PER-COPY perturbation so content-
addressed operators see new entities rather than 10 verbatim clones
(which would inflate cross-copy duplicate/neighbor structure ~50x and
make the probe measure a different workload):

* ``documents.text``: per-copy rotation of the 8 most frequent letters
  (``translate``) — changes most character n-grams and word tokens,
  preserves length, whitespace structure, and the INTRA-copy duplicate
  topology exactly (each copy contributes the same true-pair set the
  sf0.1 corpus has).
* ``embeddings.embedding``: per-copy cyclic rotation of the vector
  dimensions — new points with the identical norm/label distribution
  (cosine geometry within a copy is preserved; copies don't collapse
  onto each other).

Usage: python scripts/gen_scale.py [factor] [src_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 <repo>/.scaledata/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

#: Per-key-family shift units — generous vs the sf0.1 ranges so copies
#: are disjoint; int32 key columns (nation/region) stay inside int32.
KEY_UNITS: dict[str, int] = {
    "custkey": 10**6,
    "nationkey": 10**3,
    "regionkey": 10**2,
    "suppkey": 10**6,
    "partkey": 10**7,
    "orderkey": 10**8,
    "doc_id": 10**7,
    "vec_id": 10**7,
    "event_id": 10**9,
    "user_id": 10**7,
}

TABLES = (
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

_ROT_ALPHABET = "etaoinsr"


def _rot(s: str, i: int) -> str:
    k = i % len(s)
    return s[k:] + s[:k]


def scaled_copy(df, name: str, i: int):
    """Copy ``i`` of a table: key columns shifted by i * unit, content
    columns perturbed deterministically where clone-identity would
    distort the workload."""
    out = df
    for c, dtype in df.dtypes:
        fam = next((k for k in KEY_UNITS if c.endswith(k)), None)
        if fam and i > 0:
            out = out.withColumn(c, (F.col(c) + F.lit(i * KEY_UNITS[fam]).cast(dtype)))
    if name == "documents" and i > 0:
        out = out.withColumn(
            "text", F.translate("text", _ROT_ALPHABET, _rot(_ROT_ALPHABET, i))
        )
    if name == "embeddings" and i > 0:
        n = "size(embedding)"
        out = out.withColumn(
            "embedding",
            F.expr(
                f"concat(slice(embedding, {i % 16} + 1, {n} - {i % 16}),"
                f" slice(embedding, 1, {i % 16}))"
            ),
        )
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(repo, ".scaledata", "sf1")
    os.makedirs(out_dir, exist_ok=True)

    from mapr_plugins_spark.session import get_session

    spark = get_session(app_name="gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for name in TABLES:
        base = spark.read.parquet(f"{src}/{name}.parquet")
        scaled = scaled_copy(base, name, 0)
        for i in range(1, factor):
            scaled = scaled.unionByName(scaled_copy(base, name, i))
        dest = f"{out_dir}/{name}.parquet"
        scaled.write.mode("overwrite").parquet(dest)
        print(f"{name}: {factor}x written to {dest}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
