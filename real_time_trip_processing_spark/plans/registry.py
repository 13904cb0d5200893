"""Registry of declared queries.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent DuckDB oracle SQL string
over the same parquet tables. Column names/types are aligned on both
sides — the driver sorts columns by name and value-hashes, so aliases
must match exactly (see SURVEY §2.13).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    builder: Builder
    oracle: str | None  # None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, DeclaredQuery] = {}


def declare(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        # A silent overwrite once shadowed a documented query for a full
        # round (dataset_split, round 6 verdict #1): two modules declared
        # the same name and import order picked the winner. Make the
        # collision structurally impossible — a duplicate is always a
        # programming error, never intent.
        if name in REGISTRY:
            raise ValueError(
                f"declared query name collision: {name!r} is already "
                f"registered by {REGISTRY[name].builder.__module__}."
                f"{REGISTRY[name].builder.__qualname__}; refusing to "
                f"silently shadow it"
            )
        REGISTRY[name] = DeclaredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco
