"""Every registry query must hash-match its DuckDB oracle at sf0.001 —
a fast local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import duckdb
import pytest

from big_data_2021_spark_streaming_spark.plans.registry import all_queries
from tools.check_oracle import TABLES, rows_to_multiset

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
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert srows is not None  # rows-only check: query must at least run
        return
    cur = oracle_con.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert rows_to_multiset(sdf.columns, srows) == rows_to_multiset(dcols, drows)
