"""mapr_plugins_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the
``data-integrations/mapr-plugins`` CDAP plugin bundle (reference, read-only)
on idiomatic Spark DataFrame / SQL / Structured Streaming:

* the reference's connector semantics (Kafka-API stream source with
  earliest/latest offsets, format-parsed payloads, JSON document sink with
  skip-null encode) — see ``sources/`` and ``sinks/``;
* the relational operator surface the reference delegates to its host
  (joins, aggregations, windows, set ops, scalar functions) — expressed
  directly with DataFrame/Catalyst primitives in ``queries.py``;
* large-scale training-data-pipeline extensions (dedup, similarity search,
  multimodal columns, text analysis) — ``operators/``.

Design stance: the IR is the Catalyst plan. We declare logical plans with
the DataFrame API and let Catalyst/Tungsten/AQE pick physical strategies;
Python-side execution (pandas UDFs) appears only where built-in operators
cannot express the semantics.
"""

from mapr_plugins_spark.session import get_session, release_operator_caches
from mapr_plugins_spark.catalog import TABLES, load_tables

__all__ = ["get_session", "release_operator_caches", "load_tables", "TABLES"]
__version__ = "0.1.0"
