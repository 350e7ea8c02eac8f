"""The engine facade declared in SURVEY §3.4.

``Engine`` ties the existing pieces into the user-facing lifecycle —
``engine.sql(str)`` / ``engine.table(name)`` → PySpark DataFrame
(unresolved logical plan) → Catalyst analyze/optimize → AQE physical
plan → Tungsten execution:

1. the pinned session factory (``session.get_session``: AQE, Arrow,
   UTC, split sizing),
2. the catalog (every test table registered as a temp view under its
   oracle name, with the same physical-type normalization the batch
   catalog applies — ``engine.sql`` sees exactly the names and types
   the DuckDB oracle does),
3. the declared operator/query registry (``engine.query(key)`` runs
   any ``queries()`` key against this engine's data directory).

There is deliberately no custom IR: the IR is the Catalyst plan
(SURVEY §3.4), so everything Catalyst gives — pushdown, pruning,
broadcast, AQE — applies to facade-issued SQL identically to the
DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapr_plugins_spark.catalog import TABLES, table
from mapr_plugins_spark.session import get_session


class Engine:
    """User-facing entry point: one object per data directory.

    ``spark`` may be supplied (e.g. the driver's plain session) — the
    facade then only registers views and never mutates session-level
    configuration beyond what `catalog.table` needs.
    """

    def __init__(
        self,
        sf_dir: str,
        spark: SparkSession | None = None,
        app_name: str = "mapr-plugins-engine",
    ) -> None:
        self.spark = spark or get_session(app_name=app_name)
        self.sf_dir = sf_dir
        for t in TABLES:
            table(self.spark, sf_dir, t).createOrReplaceTempView(t)

    def table(self, name: str) -> DataFrame:
        """A registered table as a DataFrame (catalog-normalized types)."""
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; known: {TABLES}")
        return self.spark.table(name)

    def sql(self, query: str) -> DataFrame:
        """Run SQL over the registered views (same names as the oracle)."""
        return self.spark.sql(query)

    def query(self, key: str) -> DataFrame:
        """Run a declared registry query (any ``queries()`` key) against
        this engine's data directory."""
        import __spark_entry__ as E

        reg = E.queries()
        if key not in reg:
            raise KeyError(f"unknown query key {key!r}")
        return reg[key](self.spark, self.sf_dir)

    def keys(self) -> list[str]:
        """All declared query keys, priority window first."""
        import __spark_entry__ as E

        return list(E.queries())

    def audit(self, target: str | DataFrame) -> dict:
        """Plan-quality report for a DataFrame or a registry key — the
        "would this survive 100×?" checklist as data: exchange count,
        broadcast/cartesian presence, Python stages, pushed filters and
        read schemas (the same properties tests/test_plans.py pins,
        exposed for ad-hoc queries a user writes through the facade)."""
        from mapr_plugins_spark.plans import audit as A

        df = self.query(target) if isinstance(target, str) else target
        p = A.plan_str(df)
        return {
            "shuffles": A.shuffle_count(df),
            "broadcast_join": A.has_broadcast_join(df),
            "cartesian": A.has_cartesian(df),
            # every physical node that executes Python: row UDFs, Arrow
            # UDFs, mapInPandas/mapInArrow, applyInPandas(+WithState).
            # FlatMapGroupsInPandasWithState also substring-matches
            # "FlatMapGroupsInPandas", so one count covers both.
            "python_stages": sum(
                p.count(n)
                for n in (
                    "BatchEvalPython",
                    "ArrowEvalPython",
                    "MapInPandas",
                    "FlatMapGroupsInPandas",
                    "FlatMapCoGroupsInPandas",
                    "MapInArrow",
                )
            ),
            "pushed_filters": A.pushed_filters(df),
            "read_schemas": A.read_schemas(df),
        }
