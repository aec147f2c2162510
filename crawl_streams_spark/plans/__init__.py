"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark builder, DuckDB oracle SQL) pair — the driver-contract surface.

Importing this package populates ``REGISTRY`` from the per-domain modules.
"""

from .registry import REGISTRY, Query, query  # noqa: F401

# Populate the registry (import order = display order).
from . import q_events  # noqa: E402,F401
from . import q_tpch  # noqa: E402,F401
from . import q_text  # noqa: E402,F401
from . import q_dedup  # noqa: E402,F401
from . import q_similarity  # noqa: E402,F401
from . import q_crawl  # noqa: E402,F401
from . import q_schedule  # noqa: E402,F401
from . import q_sql_extra  # noqa: E402,F401
from . import q_pivot  # noqa: E402,F401
from . import q_sessions  # noqa: E402,F401
from . import q_joins_advanced  # noqa: E402,F401
from . import q_tpch2  # noqa: E402,F401
from . import q_tpch3  # noqa: E402,F401
from . import q_pipeline  # noqa: E402,F401
