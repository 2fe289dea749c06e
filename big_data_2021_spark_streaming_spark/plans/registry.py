"""Central query registry: name → (builder, oracle SQL | None).

``__spark_entry__.py`` exposes this to the driver; tests and bench.py
iterate it. Builders are ``(spark, sf_dir) -> DataFrame``; oracle SQL
is DuckDB-runnable ANSI SQL over the same tables, or None for
genuinely non-SQL-expressible operators (the driver then records a
weaker rows-only check).
"""

from __future__ import annotations

import importlib
import warnings
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
    from . import analytics, rsvp_fixture
    from .oracles import ORACLES

    registry: dict[str, QuerySpec] = {}

    def add(queries: dict, oracles: dict) -> None:
        for name, build in queries.items():
            registry[name] = QuerySpec(name, build, oracles.get(name))

    # Registration order = the driver's grading order, and its gate has a
    # budget (r02 stopped at 50/74, leaving the tail ungraded). Families
    # least-recently hash-verified register FIRST: the r02-re-planned
    # dedup plans and the similarity/text/multimodal/curation surface,
    # then the rsvp fixtures, and the twice-proven analytics suite last.
    # Only a genuinely missing OPTIONAL third-party package may drop a
    # query family (with a warning); a typo'd import inside an operator
    # module must fail loudly, not silently shrink the correctness gate.
    _OPTIONAL = {"pandas", "pyarrow", "duckdb", "numpy"}
    for modname in ("dedup", "similarity", "text", "multimodal", "curation"):
        try:
            mod = importlib.import_module(f"..operators.{modname}", __package__)
        except ModuleNotFoundError as e:
            missing = (e.name or "").split(".")[0]
            if missing in _OPTIONAL:
                warnings.warn(
                    f"operators.{modname} skipped: optional dependency "
                    f"{missing!r} not installed",
                    stacklevel=2,
                )
                continue
            raise
        add(mod.QUERIES, mod.ORACLES)
    add(rsvp_fixture.QUERIES, rsvp_fixture.ORACLES)
    add(analytics.QUERIES, ORACLES)
    return registry
