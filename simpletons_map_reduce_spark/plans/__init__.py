from .checks import (
    physical_plan,
    has_pushed_filters,
    reads_only_columns,
    uses_broadcast_join,
    count_broadcast_hints,
    count_exchanges,
    has_whole_stage_codegen,
)

__all__ = [
    "physical_plan",
    "has_pushed_filters",
    "reads_only_columns",
    "uses_broadcast_join",
    "count_broadcast_hints",
    "count_exchanges",
    "has_whole_stage_codegen",
]
