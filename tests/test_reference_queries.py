"""Golden tests pinning the reference's Q1/Q2/Q3 semantics, including
the load-bearing quirks documented in SURVEY.md §0:

- mtime int32 overflow → NULL under the faithful schema
- states-dim name collision → Q2 outputs FULL state names
- Q2's double-encoded inner ``event`` JSON blob, with group_name dropped
- Q3 has NO US filter (code over comment) and 1-minute tumbling windows
"""

from __future__ import annotations

import json

import pytest

from big_data_2021_spark_streaming_spark.plans.reference_queries import (
    decode_rsvps,
    q1_us_meetups,
    q2_us_meetups_enriched,
    q3_cities_per_minute,
)
from big_data_2021_spark_streaming_spark.schemas import states_dimension


def rsvp(country, city, state=None, event_id="e1", group_id=1, name="g"):
    return {
        "visibility": "public",
        "response": "yes",
        "guests": 0,
        "rsvp_id": 123,
        "mtime": 1622913129340,  # epoch-ms: overflows the declared int32
        "event": {
            "event_name": "ev name",
            "event_id": event_id,
            "event_url": "http://example/e",
        },
        "group": {
            "group_topics": [{"urlkey": "k", "topic_name": "t"}],
            "group_city": city,
            "group_country": country,
            "group_id": group_id,
            "group_name": name,
            "group_state": state,
        },
    }


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        (json.dumps(rsvp("us", "Bend", "OR")), "2021-06-09 00:00:07"),
        (json.dumps(rsvp("us", "Portland", "OR")), "2021-06-09 00:00:30"),
        (json.dumps(rsvp("us", "Austin", "TX")), "2021-06-09 00:01:07"),
        (json.dumps(rsvp("us", "Nowhere", "ZZ")), "2021-06-09 00:01:30"),
        (json.dumps(rsvp("gb", "London")), "2021-06-09 00:00:45"),
        ("{not valid json", "2021-06-09 00:02:01"),
    ]
    return spark.createDataFrame(rows, ["value", "timestamp"])


def test_decode_permissive_and_mtime_overflow(raw):
    decoded = decode_rsvps(raw).select("data.mtime", "data.group.group_city")
    rows = decoded.collect()
    # malformed JSON row -> NULL struct fields, not an error (PERMISSIVE)
    assert sum(r.group_city is None for r in rows) == 1
    # faithful schema: epoch-ms overflows int32 -> NULL mtime on EVERY row
    assert all(r.mtime is None for r in rows)


def test_decode_normalized_mtime(raw):
    decoded = decode_rsvps(raw, mode="normalized").select("data.mtime")
    vals = {r.mtime for r in decoded.collect()}
    assert 1622913129340 in vals


def test_q1_keeps_only_us(raw):
    rows = q1_us_meetups(raw).select("group.group_city").collect()
    assert sorted(r.group_city for r in rows) == [
        "Austin",
        "Bend",
        "Nowhere",
        "Portland",
    ]


def test_q2_state_name_swap_and_double_encoding(raw, spark):
    out = q2_us_meetups_enriched(raw, states_dimension(spark)).collect()
    payloads = [json.loads(r.value) for r in out]
    # 'Nowhere' (state ZZ) dropped by the inner join; gb row dropped by Q1
    assert len(payloads) == 3
    states = {p["group_state"] for p in payloads}
    assert states == {"OREGON", "TEXAS"}  # full names, not abbreviations
    for p in payloads:
        assert "group_name" not in p  # selected upstream, dropped in payload
        inner = json.loads(p["event"])  # double-encoded JSON string
        assert inner["event_id"] == "e1"
        assert set(p) == {
            "event",
            "group_city",
            "group_country",
            "group_id",
            "group_state",
        }


def test_q3_windows_all_countries(raw):
    rows = q3_cities_per_minute(raw, as_json=False).collect()
    by_minute = {r.minute: sorted(r.cities) for r in rows}
    # minute 0: Bend + Portland + London (NO US filter on Q3 path)
    assert by_minute[0] == ["Bend", "London", "Portland"]
    assert by_minute[1] == ["Austin", "Nowhere"]
    # malformed row still lands in its window with a NULL city collect_set
    assert 2 in by_minute
    for r in rows:
        assert r.month == 6 and r.day_of_the_month == 9 and r.hour == 0


def test_q3_json_payload_shape(raw):
    out = q3_cities_per_minute(raw, as_json=True).collect()
    p = json.loads(sorted(r.value for r in out)[0])
    assert set(p) <= {"month", "day_of_the_month", "hour", "minute", "cities"}
