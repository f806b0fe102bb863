"""columnarmodeling_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) providing the query and data-processing
capabilities exercised by the reference repo ``TJUJZGC132/ColumnarModeling``
(surveyed with file:line citations in ``SURVEY.md``): whitespace/positional
table scans, binned proximity (gap) joins, equi/semi/anti/range joins,
grouped aggregation, window/neighbor operators, set ops, seeded stochastic
geometry kernels, partitioned binary snapshot I/O, and a streaming tier —
plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Everything is expressed Spark-first: DataFrame/SQL logical plans optimized
by Catalyst, Arrow-batched pandas UDFs only where built-ins genuinely
cannot express the semantics.
"""

from columnarmodeling_spark.session import get_spark
from columnarmodeling_spark.catalog import TABLES, load_tables

__all__ = ["get_spark", "load_tables", "TABLES"]
__version__ = "0.1.0"
