"""PII detection / redaction expressions for the training-data pipeline.

Extension family (no reference counterpart). Patterns deliberately use only
regex constructs with identical semantics in Java regex (Spark) and RE2
(DuckDB): character classes, bounded quantifiers, literal dots — no
backreferences, no lookaround — so oracle SQL reproduces every count.

All detection/redaction is a narrow map over the text column: zero shuffle,
whole-stage codegen, trivially parallel at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

PATTERNS: dict[str, str] = {"email": EMAIL_RE, "ipv4": IPV4_RE}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(text: Column | str, kind: str) -> Column:
    """Number of non-overlapping matches of the given PII kind."""
    return F.regexp_count(_c(text), F.lit(PATTERNS[kind]))


def scrub(text: Column | str) -> Column:
    """Redact every known PII pattern with a typed placeholder. IPv4 runs
    after email so an address inside an email's domain is already gone."""
    out = _c(text)
    out = F.regexp_replace(out, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, IPV4_RE, "[IP]")
    return out
