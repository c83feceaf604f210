"""cdc_pipe_line_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference CDC pipeline
(MuhammadAdil-Developer/CDC-pipe-line, surveyed in SURVEY.md):
snapshot-diff CDC, SCD Type-2 temporal tables, wide<->tall financial
reshaping, event-count time series with anomaly scoring, streaming
apply — plus the large-scale training-data operators (dedup,
similarity search, text analysis, multimodal columns) a 100 TB
pipeline needs.

Design principles (see SURVEY.md §4, §7):
- Declarative DataFrame/SQL plans; Catalyst owns the physical strategy.
- No driver-side loops on the data path; no per-row writes.
- Pandas UDFs / applyInPandas only where built-ins can't express the op.
- Partition-aware: every operator documents its shuffle behavior.
"""

from cdc_pipe_line_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
