from goeventstream_spark.plans.inspect import (
    count_exchanges,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    scan_read_schema,
)
from goeventstream_spark.plans.profile import execution_profile, shuffle_profile

__all__ = [
    "physical_plan",
    "pushed_filters",
    "scan_read_schema",
    "has_broadcast_join",
    "count_exchanges",
    "execution_profile",
    "shuffle_profile",
]
