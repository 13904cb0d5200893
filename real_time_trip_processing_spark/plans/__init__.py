"""Declared-query registry: every operator from SURVEY §2 exposed as a
named (Spark builder, DuckDB oracle SQL) pair for the driver harness."""

from .registry import REGISTRY, DeclaredQuery, declare  # noqa: F401

# importing the modules populates REGISTRY
from . import analytic_queries  # noqa: E402,F401
from . import curation_queries  # noqa: E402,F401
from . import relational_queries  # noqa: E402,F401
from . import stats_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import tpch_queries  # noqa: E402,F401
from . import tpch2_queries  # noqa: E402,F401
from . import trip_queries  # noqa: E402,F401
from . import vector_queries  # noqa: E402,F401
