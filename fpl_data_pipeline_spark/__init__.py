"""fpl_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference FPL data pipeline (Mylo19984/fpl-data-pipeline):
star-schema analytics (joins, aggregations, window pivots, top-k), keyed
idempotent upsert, JSON->star ingestion, incremental high-water-mark loading,
plus large-scale training-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal column plumbing) that the 100 TB design target calls
for.

Everything is DataFrame-native: logical plans are declared with the
DataFrame/SQL API so Catalyst handles pushdown, pruning, join selection and
AQE; Python UDFs appear only where built-ins genuinely cannot express the
semantics (and then as Arrow-batched pandas UDFs).
"""

from fpl_data_pipeline_spark.session import get_spark
from fpl_data_pipeline_spark.registry import QUERIES, ORACLE_SQL, register

__all__ = ["get_spark", "QUERIES", "ORACLE_SQL", "register"]

__version__ = "0.1.0"
