"""Property tests for the pure streaming top-k merge (no JVM needed).

merge_topk keeps only k rows of state per key; the property that makes
that legal is fold-truncation safety: merging batch-by-batch with
truncation to k after every step must equal sorting everything at once
and taking the first k — for any values, any k, any batch slicing.
"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from big_data_2021_spark_streaming_spark.streaming.pipeline import merge_topk

pairs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),
        st.integers(min_value=-1000, max_value=1000).map(float),
    ),
    max_size=60,
)


def one_shot_topk(pairs, k):
    return sorted(pairs, key=lambda t: (-t[1], t[0]))[:k]


@given(pairs_strategy, st.integers(min_value=1, max_value=10), st.data())
def test_sliced_fold_equals_one_shot(pairs, k, data):
    cut_points = sorted(
        data.draw(
            st.lists(st.integers(min_value=0, max_value=len(pairs)), max_size=5)
        )
    )
    bounds = [0, *cut_points, len(pairs)]
    cur: list = []
    for lo, hi in zip(bounds, bounds[1:]):
        cur = merge_topk(cur, pairs[lo:hi], k)
    assert cur == one_shot_topk(pairs, k)


def test_ties_break_by_event_id():
    assert merge_topk([], [(5, 1.0), (2, 1.0), (9, 1.0)], 2) == [
        (2, 1.0),
        (5, 1.0),
    ]
