"""Local replica of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle at the given
scale factor, then compares row count, sorted column names, and an
order-insensitive canonical value set. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from big_data_2021_spark_streaming_spark.plans.registry import all_queries
from big_data_2021_spark_streaming_spark.session import get_session

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=repr,
    )


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
        try:
            sdf = spec.build(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: {len(srows)} rows (no oracle; rows-only)")
            continue
        try:
            cur = con.execute(spec.oracle)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sm, dm = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
            if sm != dm:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sm, dm)) if a != b), None
                )
                detail = f" first-diff@{diff}: {sm[diff]} vs {dm[diff]}" if diff is not None else ""
                problems.append(f"value mismatch{detail}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: {len(srows)} rows")
    spark.stop()
    print(f"\n{len(specs) - len(failures)}/{len(specs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
