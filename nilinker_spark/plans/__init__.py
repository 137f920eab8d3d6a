"""Physical-plan inspection utilities (the ".explain and iterate" loop)."""

from nilinker_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_python_stage,
    has_rowwise_python_stage,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
    shuffle_exchange_count,
)
