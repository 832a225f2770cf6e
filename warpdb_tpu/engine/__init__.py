"""Execution engine: expression compiler, plan executor, UDF registry."""

from .compiler import (
    build_evaluator,
    cache_stats,
    clear_cache,
    compile_filter_project,
)
from .udf import register_udf, resolve_udf

__all__ = [
    "build_evaluator",
    "cache_stats",
    "clear_cache",
    "compile_filter_project",
    "register_udf",
    "resolve_udf",
]
