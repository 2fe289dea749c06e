"""Local replica of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle at the given
scale factor, then compares row count, sorted column names, and an
order-insensitive canonical value set. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]

Both result sets are materialized through pandas (Spark ``toPandas``,
DuckDB ``.df()``) and compared on ``repr`` of the canonical cell, so
dtype drift the driver's hash gate would catch — e.g. DuckDB
SUM(BIGINT) → HUGEINT → pandas float64 ``2.0`` vs Spark int64 ``2`` —
fails here too, instead of being silently coerced equal the way
``fetchall()``'s Python ints were (the r02 `returnflag_priority_counts`
escape).
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np

from big_data_2021_spark_streaming_spark.plans.registry import all_queries
from big_data_2021_spark_streaming_spark.session import get_session

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


class DriverContractError(TypeError):
    """A cell shape the DRIVER's canonicalizer cannot grade."""


def canon(v) -> str:
    """Canonical, dtype-sensitive cell representation.

    int 2 and float 2.0 canonicalize DIFFERENTLY (matching the driver's
    pandas-based hash); floats are rounded to 9 places first so
    last-ulp engine drift doesn't flag.

    Collection cells are REJECTED, not serialized: the driver's pandas
    canonicalizer (sort_values → Categorical factorize) crashes on
    numpy arrays ("unhashable type"), so a query whose values this
    replica could happily compare would still burn a graded round —
    exactly what happened to dedup_keep_manifest for three rounds
    (CORRECTNESS_r07 err). Crash-parity here means the contract
    violation fails LOCALLY first.
    """
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise DriverContractError(
            f"collection cell {type(v).__name__} — the driver's pandas "
            "canonicalizer cannot hash it; serialize to a string "
            "(array_join / to_json) at the grade boundary"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if v is None or v != v:  # pandas NaT compares unequal to itself
        return "NULL"
    return repr(v)


def frame_to_multiset(df) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(canon(row[c]) for c in cols)
        for row in df.to_dict(orient="records")
    ]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = all_queries()
    if only:
        specs = {k: v for k, v in specs.items() if k in only}

    spark = get_session("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()

        def took() -> str:
            # flag slow gate entries so a sweep log doubles as the
            # which-oracle-is-the-bottleneck profile
            dt = time.perf_counter() - t0
            return f" [{dt:.1f}s]" if dt >= 5 else ""

        try:
            sdf = spec.build(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}{took()}", flush=True)
            continue
        if spec.oracle is None:
            print(f"ok   {name}: {len(spdf)} rows (no oracle; rows-only){took()}", flush=True)
            continue
        try:
            ddf = con.execute(spec.oracle).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}{took()}", flush=True)
            continue
        problems = []
        if len(spdf) != len(ddf):
            problems.append(f"rowcount spark={len(spdf)} duckdb={len(ddf)}")
        if sorted(spdf.columns) != sorted(ddf.columns):
            problems.append(
                f"cols spark={sorted(spdf.columns)} duckdb={sorted(ddf.columns)}"
            )
        if not problems:
            try:
                sm, dm = frame_to_multiset(spdf), frame_to_multiset(ddf)
            except DriverContractError as e:
                failures.append(name)
                print(f"FAIL {name}: driver contract — {e}{took()}", flush=True)
                continue
            if sm != dm:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sm, dm)) if a != b), None
                )
                detail = (
                    f" first-diff@{diff}: {sm[diff]} vs {dm[diff]}"
                    if diff is not None
                    else ""
                )
                problems.append(f"value mismatch{detail}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}{took()}", flush=True)
        else:
            print(f"PASS {name}: {len(spdf)} rows{took()}", flush=True)
    spark.stop()
    print(f"\n{len(specs) - len(failures)}/{len(specs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
