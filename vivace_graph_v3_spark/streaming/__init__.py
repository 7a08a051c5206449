"""Streaming surface: txn-log replication + incremental view maintenance
(the reference's transaction-streaming.lisp re-expressed as Structured
Streaming over the append-only txn log)."""

from vivace_graph_v3_spark.streaming.replication import (  # noqa: F401
    replicate, replicate_and_wait, subset_filter,
)
from vivace_graph_v3_spark.streaming.view_maintenance import (  # noqa: F401
    ViewMaintainer,
)
