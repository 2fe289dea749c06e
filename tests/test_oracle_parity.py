"""Every registry query must hash-match its DuckDB oracle at sf0.001 —
a fast local replica of the driver's t2 correctness gate.

Comparison is pandas-materialized and dtype-sensitive (``repr`` of the
canonical cell), replicating how the driver hashes: DuckDB HUGEINT →
pandas float64 ``2.0`` vs Spark int64 ``2`` FAILS here, as it does at
the driver (the r02 escape this pins).
"""

from __future__ import annotations

import duckdb
import pytest

from big_data_2021_spark_streaming_spark.plans.registry import all_queries
from tools.check_oracle import TABLES, frame_to_multiset

SPECS = all_queries()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = SPECS[name]
    sdf = spec.build(spark, sf_dir)
    spdf = sdf.toPandas()
    if spec.oracle is None:
        assert spdf is not None  # rows-only check: query must at least run
        return
    ddf = oracle_con.execute(spec.oracle).df()
    assert sorted(spdf.columns) == sorted(ddf.columns)
    assert len(spdf) == len(ddf)
    assert frame_to_multiset(spdf) == frame_to_multiset(ddf)


# Oracle type lint: DuckDB SUM/aggregate over BIGINT widens to HUGEINT,
# which pandas materializes as float64 and the driver's hash gate then
# sees as a different value family than Spark's int64. DESCRIBE plans
# the query without executing it, so this covers all oracles cheaply.
@pytest.mark.parametrize(
    "name", sorted(n for n in SPECS if SPECS[n].oracle is not None)
)
def test_oracle_emits_no_hugeint(name, oracle_con):
    desc = oracle_con.execute(f"DESCRIBE {SPECS[name].oracle}").fetchall()
    bad = [(col, typ) for col, typ, *_ in desc if "HUGEINT" in typ.upper()]
    assert not bad, (
        f"oracle column(s) widen to HUGEINT — wrap in CAST(... AS BIGINT): {bad}"
    )
