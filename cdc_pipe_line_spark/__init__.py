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

from cdc_pipe_line_spark.cdc.diff import (
    first_load_events,
    snapshot_diff,
    to_cdc_events,
)
from cdc_pipe_line_spark.cdc.scd2 import (
    apply_scd2,
    as_of,
    current_view,
    dedup_events,
    scd2_from_snapshots,
    scd2_from_upserts,
)
from cdc_pipe_line_spark.session import get_spark

__all__ = [
    "get_spark",
    # CDC diff (J1-J5)
    "snapshot_diff",
    "first_load_events",
    "to_cdc_events",
    # SCD2 (J6-J10)
    "apply_scd2",
    "dedup_events",
    "current_view",
    "as_of",
    "scd2_from_upserts",
    "scd2_from_snapshots",
]
__version__ = "0.1.0"
