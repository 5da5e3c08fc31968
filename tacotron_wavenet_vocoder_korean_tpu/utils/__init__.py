"""Logging, plotting, misc utilities."""
from .infolog import init as infolog_init, log, ValueWindow
from . import plot

__all__ = ["infolog_init", "log", "ValueWindow", "plot"]
