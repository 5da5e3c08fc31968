"""Logging, plotting, profiling, metrics, misc utilities."""
from .infolog import init as infolog_init, log, ValueWindow
from .misc import (
    enable_compilation_cache, add_platform_arg, set_platform, str2bool, get_time, add_postfix, get_git_revision, parallel_map,
    remove_file,
)
from . import plot, profiling, metrics

__all__ = [
    "infolog_init", "log", "ValueWindow", "plot", "profiling", "metrics",
    "enable_compilation_cache", "add_platform_arg", "set_platform", "str2bool", "get_time", "add_postfix", "get_git_revision",
    "parallel_map", "remove_file",
]
