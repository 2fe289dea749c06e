"""Cross-engine parity of the SIGNED half-away value-sum means on a
NEGATIVE-value events table (ADVICE r04: the graded fixtures are
strictly positive, so the sign-split branches of experiment_srm_check /
experiment_cuped_lift were never exercised), plus the dense-day-grid
contract of user_dau_wau_stickiness (a zero-activity day must be
REPORTED with dau=0 / stickiness=0, not silently omitted).

The synthetic events table is written once per module with values of
both signs, .5-boundary sums, and a deliberate 2-day activity gap.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_2021_spark_streaming_spark.plans.registry import all_queries
from tools.check_oracle import frame_to_multiset

NAMES = [
    "experiment_srm_check",
    "experiment_cuped_lift",
    "event_seasonal_naive_mape",
    "user_dau_wau_stickiness",
]


@pytest.fixture(scope="module")
def neg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("negvalues")
    base = dt.datetime(2021, 3, 1)
    rows = []
    eid = 0
    # 40 users x 20 days; values symmetric-ish around 0 with exact .5
    # micro boundaries on arm sums (the case the sign split decides);
    # days 9 and 10 are a deliberate zero-activity gap
    for day in range(20):
        if day in (9, 10):
            continue
        for u in range(40):
            if (u + day) % 3 == 0:
                continue  # per-day user churn so DAU varies
            eid += 1
            sign = -1 if (u % 2 == 0) else 1
            val = sign * ((u * 7 + day) % 13 + 0.0000005 * (u % 2))
            rows.append(
                {
                    "event_id": eid,
                    "ts": base + dt.timedelta(days=day, hours=u % 24),
                    "user_id": u,
                    "event_type": ["click", "view", "purchase"][u % 3],
                    "value": val,
                    "props": "{}",
                }
            )
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def neg_con(neg_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{neg_dir}/events.parquet')"
    )
    return con


@pytest.mark.parametrize("name", NAMES)
def test_signed_means_match_oracle_on_negative_values(
    name, spark, neg_dir, neg_con
):
    spec = all_queries()[name]
    spdf = spec.build(spark, neg_dir).toPandas()
    ddf = neg_con.execute(spec.oracle).df()
    assert sorted(spdf.columns) == sorted(ddf.columns)
    assert len(spdf) == len(ddf)
    assert frame_to_multiset(spdf) == frame_to_multiset(ddf)


def test_negative_arm_sums_actually_exercised(spark, neg_dir):
    # the fixture must drive at least one arm/pooled value sum negative,
    # or the sign-split parity above proves nothing
    spdf = (
        all_queries()["experiment_srm_check"]
        .build(spark, neg_dir)
        .toPandas()
    )
    assert (spdf["mean_value"] < 0).any(), spdf


def test_dau_grid_is_dense_and_gap_days_report_zero(spark, neg_dir):
    spdf = (
        all_queries()["user_dau_wau_stickiness"]
        .build(spark, neg_dir)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    days = spdf["day"].tolist()
    # dense: every day from min..max present exactly once
    assert days == list(range(days[0], days[-1] + 1))
    gap = spdf[spdf["dau"] == 0]
    assert len(gap) == 2, spdf  # the two zero-activity fixture days
    # gap days still have trailing-week actives, so stickiness is an
    # exact 0 via the dau=0 numerator, and wau stays > 0
    assert (gap["wau"] > 0).all()
    assert (gap["stickiness"] == 0.0).all()
