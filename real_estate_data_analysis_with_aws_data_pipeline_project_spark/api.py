"""Assembled query surface — the driver contract backend.

Importing this module registers every query module's entries into
``QUERIES`` / ``HEADLINE_QUERIES`` (see registry.py for conventions).
"""

from __future__ import annotations

from .registry import HEADLINE_QUERIES, QUERIES, QuerySpec, register

# Import order groups the surface roughly by SURVEY.md §2 section.
from . import queries_core  # noqa: E402,F401
from . import queries_analytics  # noqa: E402,F401
from . import queries_scalar  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_dedup  # noqa: E402,F401
from . import queries_similarity  # noqa: E402,F401
from . import queries_events  # noqa: E402,F401
from . import queries_multimodal  # noqa: E402,F401
from . import queries_joins_ext  # noqa: E402,F401
from . import queries_udf  # noqa: E402,F401
from . import queries_pipeline  # noqa: E402,F401
from . import queries_skew  # noqa: E402,F401
from . import queries_extra  # noqa: E402,F401
from . import queries_text2  # noqa: E402,F401
from . import queries_window2  # noqa: E402,F401
from . import queries_corpus  # noqa: E402,F401
from . import queries_sketch  # noqa: E402,F401

__all__ = ["HEADLINE_QUERIES", "QUERIES", "QuerySpec", "register"]
