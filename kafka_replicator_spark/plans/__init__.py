from kafka_replicator_spark.plans.explain import (
    physical_plan,
    pushed_filters,
    has_broadcast_join,
    count_exchanges,
    has_wholestage_codegen,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "has_broadcast_join",
    "count_exchanges",
    "has_wholestage_codegen",
]
