"""Replicates the driver's verify protocol against __spark_entry__.py.

Usage: python tests/driver_sim.py [sf_dir] [--tz TZ] [--only sub1,sub2]
       [--slice i:j]   # grade only sorted-keys[i:j] (chunked sweeps)
       [--master local[2]] [--shuffle 5]   # hostile-parallelism axis

Creates a *plain* SparkSession (driver-style: no engine configs), runs
entry() as a smoke check, then every queries()[name] at sf_dir and
hash-compares with oracle_sql()[name] via DuckDB — order-insensitive,
column-name-sorted, like CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession


def _flag(name: str, default=None):
    """Value of ``--name VALUE``: loud on a missing/flag-shaped value
    (round-10 advice: the bare .index()+1 pattern raised an unhelpful
    IndexError, and a trailing bare flag silently ate its neighbor)."""
    if name not in sys.argv:
        return default
    i = sys.argv.index(name) + 1
    if i >= len(sys.argv) or sys.argv[i].startswith("--"):
        raise SystemExit(f"{name} requires a value")
    return sys.argv[i]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    tz = _flag("--tz")
    only = _flag("--only")
    if only is not None:
        only = only.split(",")
    sl = _flag("--slice")
    if sl is not None:
        i, j = sl.split(":")
        sl = (int(i), int(j))
    # --mem: for the over-and-above sf0.1 scale probes ONLY — the
    # driver's real gate (sf0.01) always runs the plain 1g session,
    # but a 1g single-JVM "cluster" is artificially tiny for 10x-scale
    # wedge joins (real executors get 8-64g)
    mem = _flag("--mem")
    # --master/--shuffle: hostile-parallelism axis, e.g. --master
    # local[2] --shuffle 5 proves no key's VALUES depend on core
    # count, partition count, or intra-partition arrival order
    master = _flag("--master", "local[8]")
    shuffle = _flag("--shuffle")

    b = SparkSession.builder.appName("driver-sim").master(master)
    if tz:
        b = b.config("spark.sql.session.timeZone", tz)
    if mem:
        b = b.config("spark.driver.memory", mem)
    if shuffle:
        b = b.config("spark.sql.shuffle.partitions", shuffle)
    spark = b.getOrCreate()

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from tests.oracle_harness import canonicalize, run_duckdb, spark_rows

    rows = E.entry(spark).collect()
    print(f"entry(): {len(rows)} rows, schema ok" if rows else "entry(): EMPTY", flush=True)
    assert len(rows) > 0

    qs, os_ = E.queries(), E.oracle_sql()
    n_pass = n_fail = 0
    names = sorted(qs)
    if sl:
        names = names[sl[0] : sl[1]]
    for name in names:
        if only and not any(o in name for o in only):
            continue
        t0 = time.time()
        try:
            got = canonicalize(spark_rows(qs[name](spark, sf_dir)))
            if name not in os_:
                status = f"rows-only ({len(got)} rows)"
                ok = len(got) >= 0
            else:
                want = canonicalize(run_duckdb(os_[name], sf_dir))
                ok = got == want
                status = f"match ({len(got)} rows)" if ok else (
                    f"MISMATCH spark={len(got)} duckdb={len(want)}"
                )
        except Exception as exc:  # driver records errors per query
            ok, status = False, f"ERROR {type(exc).__name__}: {exc}"
        # operator-internal persists are per-query working state; in a
        # long one-JVM sweep they accumulate into storage-memory
        # pressure no real multi-executor cluster would see (observed:
        # heap OOM ~70 keys into an sf0.1 sweep). Same hygiene as
        # bench.py: drop them between queries.
        spark.catalog.clearCache()
        n_pass += ok
        n_fail += not ok
        print(f"  {name:28s} {'PASS' if ok else 'FAIL'}  {status}  [{time.time()-t0:.1f}s]", flush=True)
    print(f"driver-sim: {n_pass} pass / {n_fail} fail at {sf_dir}" + (f" tz={tz}" if tz else ""))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
