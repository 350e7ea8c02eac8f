"""Declarative data-quality expectations — the dbt-tests/Great-
Expectations-style contract runner: a config names the rules, the
engine compiles each into ONE aggregate or anti-join and returns a
verdict table ``(rule, n_violations, passed)``.

This is the config-driven shape the reference's ecosystem uses for
validation stages: users declare constraints as strings/properties,
never write dataflow. Each rule is exactly one scan-shaped job:

* ``not_null``        — count of NULLs in the column;
* ``unique``          — rows beyond the first per value (duplicates);
* ``accepted_values`` — rows outside the allowed literal set;
* ``references``      — left-anti count against the referenced key
  (the FK orphan check; broadcast when the referenced side is small).

At 100 TB every rule is map-side-combinable (the anti-join broadcasts
or shuffles on the key exactly like any other join) and the report is
rule-cardinality sized.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_expectations(
    df: DataFrame,
    not_null: tuple[str, ...] = (),
    unique: tuple[str, ...] = (),
    accepted_values: dict[str, tuple] | None = None,
    references: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Run the declared expectation suite; one row per rule:
    ``(rule, n_violations, passed)``, ordered by rule name."""
    reports: list[DataFrame] = []

    def _report(rule: str, n_col):
        return df.agg(n_col.cast("long").alias("n_violations")).select(
            F.lit(rule).alias("rule"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )

    for c in not_null:
        reports.append(_report(f"not_null:{c}", F.count(F.when(F.col(c).isNull(), 1))))
    for c in unique:
        dup = df.groupBy(c).agg(F.count(F.lit(1)).alias("__n")).agg(
            F.sum(F.col("__n") - 1).cast("long").alias("n_violations")
        )
        reports.append(
            dup.select(
                F.lit(f"unique:{c}").alias("rule"),
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    for c, allowed in (accepted_values or {}).items():
        bad = F.count(
            F.when(F.col(c).isNotNull() & ~F.col(c).isin(*allowed), 1)
        )
        reports.append(_report(f"accepted_values:{c}", bad))
    for c, (ref_df, ref_col) in (references or {}).items():
        orphans = (
            df.select(F.col(c))
            .filter(F.col(c).isNotNull())
            .join(ref_df.select(F.col(ref_col).alias(c)), c, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        )
        reports.append(
            orphans.select(
                F.lit(f"references:{c}").alias("rule"),
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    if not reports:
        raise ValueError("no expectations declared")
    return reduce(lambda a, b: a.unionByName(b), reports).orderBy("rule")
