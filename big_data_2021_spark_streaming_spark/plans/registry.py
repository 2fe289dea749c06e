"""Central query registry: name → (builder, oracle SQL | None).

``__spark_entry__.py`` exposes this to the driver; tests and bench.py
iterate it. Builders are ``(spark, sf_dir) -> DataFrame``; oracle SQL
is DuckDB-runnable ANSI SQL over the same tables, or None for
genuinely non-SQL-expressible operators (the driver then records a
weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


def all_queries() -> dict[str, QuerySpec]:
    # imports deferred so importing the package never needs a JVM
    from . import analytics
    from .oracles import ORACLES

    registry: dict[str, QuerySpec] = {}

    def add(queries: dict, oracles: dict) -> None:
        for name, build in queries.items():
            registry[name] = QuerySpec(name, build, oracles.get(name))

    add(analytics.QUERIES, ORACLES)

    try:
        from ..operators import dedup

        add(dedup.QUERIES, dedup.ORACLES)
    except ImportError:
        pass
    try:
        from ..operators import similarity

        add(similarity.QUERIES, similarity.ORACLES)
    except ImportError:
        pass
    try:
        from ..operators import text

        add(text.QUERIES, text.ORACLES)
    except ImportError:
        pass
    try:
        from ..operators import multimodal

        add(multimodal.QUERIES, multimodal.ORACLES)
    except ImportError:
        pass
    return registry
