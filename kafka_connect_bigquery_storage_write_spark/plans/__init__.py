from kafka_connect_bigquery_storage_write_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_sort_merge_join,
    assert_pushed_filters,
    formatted_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_sort_merge_join",
    "assert_pushed_filters",
    "formatted_plan",
]
