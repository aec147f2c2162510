"""Structured Streaming jobs (SURVEY §2.10, §3.2, §7.5)."""

from . import analysis_job  # noqa: F401
