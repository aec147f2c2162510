"""Composed operators — each reference command becomes a query-builder
function returning a DataFrame (SURVEY §7.0 design stance), equally usable
on batch and streaming inputs since all logic is column expressions.
"""

from . import (  # noqa: F401
    dedup,
    host_stats,
    launcher,
    multimodal,
    report,
    similarity,
    txlog,
)
