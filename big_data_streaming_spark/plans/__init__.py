from big_data_streaming_spark.plans.explain import (
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
    uses_take_ordered,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "uses_broadcast_join",
    "uses_take_ordered",
]
