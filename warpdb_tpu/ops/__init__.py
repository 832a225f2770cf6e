"""Physical operators: XLA/Pallas kernels for filter, sort, aggregate, join."""

from .aggregate import (
    GroupResult,
    ValueAggregates,
    count_distinct,
    distinct_values,
    group_aggregate,
    window_aggregate,
)
from .join import JoinPhase1, join_gather_indices, join_match_counts
from .sort import float_sort_key, sort_pairs, sort_values, top_k_values

__all__ = [
    "GroupResult",
    "ValueAggregates",
    "count_distinct",
    "distinct_values",
    "group_aggregate",
    "window_aggregate",
    "JoinPhase1",
    "join_gather_indices",
    "join_match_counts",
    "float_sort_key",
    "sort_pairs",
    "sort_values",
    "top_k_values",
]
