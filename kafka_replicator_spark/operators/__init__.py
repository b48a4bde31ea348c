from kafka_replicator_spark.operators.egress import (
    assign_segments_by_count,
    assign_segments_greedy,
    segment_bounds,
    write_segments,
)
from kafka_replicator_spark.operators.compaction import (
    plan_compaction,
    merge_segments,
    compact,
)
from kafka_replicator_spark.operators.checkpoints import (
    latest_checkpoints,
    apply_checkpoint_updates,
    resume_filter,
    prune_processed_segments,
)
from kafka_replicator_spark.operators.consistent import (
    last_event_per_segment,
    consistent_listing,
)

__all__ = [
    "assign_segments_by_count",
    "assign_segments_greedy",
    "segment_bounds",
    "write_segments",
    "plan_compaction",
    "merge_segments",
    "compact",
    "latest_checkpoints",
    "apply_checkpoint_updates",
    "resume_filter",
    "prune_processed_segments",
    "last_event_per_segment",
    "consistent_listing",
]
