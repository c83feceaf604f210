"""CDC operators: snapshot diff, event envelope, SCD Type-2 apply."""

from cdc_pipe_line_spark.cdc.diff import first_load_events, snapshot_diff, to_cdc_events
from cdc_pipe_line_spark.cdc.scd2 import (
    apply_scd2,
    as_of,
    current_view,
    dedup_events,
    scd2_from_snapshots,
)

__all__ = [
    "snapshot_diff",
    "first_load_events",
    "to_cdc_events",
    "apply_scd2",
    "current_view",
    "as_of",
    "dedup_events",
    "scd2_from_snapshots",
]
