"""Streaming operators: incremental refresh plumbing and the typed-state
custom operators (SURVEY.md §2.D)."""

from .stateful import (
    recent_values_tws,
    running_type_counts_tws,
    running_user_stats,
    running_user_stats_tws,
    sessionize_tws,
    streaming_dedup_first_seen,
)

__all__ = [
    "running_user_stats",
    "running_user_stats_tws",
    "running_type_counts_tws",
    "recent_values_tws",
    "sessionize_tws",
    "streaming_dedup_first_seen",
]
