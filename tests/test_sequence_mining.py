"""Third-engine invariants for the sequence/association operators:
pure-Python recomputation from the raw parquet, independent of both
SQL engines."""

from __future__ import annotations

import itertools
from collections import Counter

import pandas as pd

from big_data_2021_spark_streaming_spark.plans.analytics import (
    PATH_GAP_MIN,
    PATH_MAX_EVENTS,
    PATH_TOPK,
    event_cooccurrence_lift,
    event_path_topk,
)

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def test_cooccurrence_lift_matches_pure_python(spark):
    ev = _events()
    ut = {(int(u), t) for u, t in zip(ev["user_id"], ev["event_type"])}
    n_users = ev["user_id"].nunique()
    per_type = Counter(t for _, t in ut)
    by_user: dict[int, set[str]] = {}
    for u, t in ut:
        by_user.setdefault(u, set()).add(t)
    pair_counts: Counter = Counter()
    for types in by_user.values():
        for a, b in itertools.combinations(sorted(types), 2):
            pair_counts[(a, b)] += 1

    rows = event_cooccurrence_lift(spark, SF).collect()
    assert len(rows) == len(pair_counts)
    for r in rows:
        assert r.type_a < r.type_b
        n_both = pair_counts[(r.type_a, r.type_b)]
        n_a, n_b = per_type[r.type_a], per_type[r.type_b]
        assert (r.n_a, r.n_b, r.n_both) == (n_a, n_b, n_both)
        num = 2 * n_both * n_users * 1_000_000 + n_a * n_b
        assert r.lift_micro == num // (2 * n_a * n_b)


def test_path_topk_matches_pure_python(spark):
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    gap_us = PATH_GAP_MIN * 60 * 1_000_000
    paths: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        ts_us = g["ts"].astype("int64").tolist()
        types = g["event_type"].tolist()
        sess: list[str] = []
        for i, t in enumerate(types):
            if i > 0 and ts_us[i] - ts_us[i - 1] > gap_us:
                paths[">".join(sess[:PATH_MAX_EVENTS])] += 1
                sess = []
            sess.append(t)
        if sess:
            paths[">".join(sess[:PATH_MAX_EVENTS])] += 1

    expected = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOPK]
    rows = event_path_topk(spark, SF).collect()
    assert [(r.path, r.n_sessions) for r in rows] == expected
    for r in rows:
        assert r.path.count(">") <= PATH_MAX_EVENTS - 1


def test_ewma_spikes_match_pure_python(spark):
    """Recompute the dyadic EWMA spike detector row-for-row: per-user
    (ts, event_id)-ordered walk keeping the last 16 micro-unit values,
    exact integer Σ vqᵢ·2ⁱ / (2ᴸ−1) and the half-up micro division."""
    import math

    from big_data_2021_spark_streaming_spark.plans.analytics import (
        EWMA_DEPTH,
        EWMA_SPIKE_MULT,
        EWMA_WARMUP,
        event_ewma_spikes,
    )

    ev = _events().sort_values(["user_id", "ts", "event_id"])
    expected = {}
    for uid, grp in ev.groupby("user_id"):
        hist: list[int] = []
        for _, row in grp.iterrows():
            v = float(row["value"])
            vq = int(math.floor(abs(v) * 1e6 + 0.5)) * (1 if v >= 0 else -1)
            window = hist[-EWMA_DEPTH:]
            L = len(window)
            if L >= EWMA_WARMUP:
                num = sum(x << i for i, x in enumerate(window))
                den = (1 << L) - 1
                if vq * den > EWMA_SPIKE_MULT * num:
                    expected[(int(uid), int(row["event_id"]))] = (
                        L,
                        ((2 * num + den) // (2 * den)) / 1e6,
                    )
            hist.append(vq)
    rows = event_ewma_spikes(spark, SF).collect()
    got = {(r.user_id, r.event_id): (r.n_hist, r.ewma) for r in rows}
    assert got == expected
    assert expected, "fixture produced no spikes — detector untested"


def test_markov_accuracy_matches_pure_python(spark):
    from big_data_2021_spark_streaming_spark.plans.analytics import (
        event_markov_accuracy,
    )

    ev = _events().sort_values(["user_id", "ts", "event_id"])
    trans = Counter()
    for _, grp in ev.groupby("user_id"):
        types = list(grp["event_type"])
        for p, n in zip(types, types[1:]):
            trans[(p, n)] += 1
    expected = {}
    prevs = {p for p, _ in trans}
    for p in prevs:
        row = {n: c for (pp, n), c in trans.items() if pp == p}
        pred = min(row, key=lambda n: (-row[n], n))
        total = sum(row.values())
        correct = row[pred]
        expected[p] = (
            pred,
            total,
            correct,
            ((2 * correct * 1_000_000 + total) // (2 * total)) / 1e6,
        )
    rows = event_markov_accuracy(spark, SF).collect()
    got = {
        r.prev_type: (r.pred_next, r.n_transitions, r.n_correct, r.accuracy)
        for r in rows
    }
    assert got == expected


def test_hazard_curve_matches_pure_python(spark):
    """Recompute the censored discrete hazard: per-user day bounds,
    7-day right-censoring, suffix-summed risk set — and the KM law
    n_at_risk is non-increasing in age with Σ churned ≤ total users."""
    from big_data_2021_spark_streaming_spark.plans.analytics import (
        HAZARD_CENSOR_DAYS,
        user_hazard_curve,
    )

    ev = _events()
    day = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    per_user = (
        pd.DataFrame({"user_id": ev["user_id"], "day": day})
        .groupby("user_id")["day"]
        .agg(["min", "max"])
    )
    gmax = per_user["max"].max()
    ended = Counter()
    churned = Counter()
    for _, r in per_user.iterrows():
        age = int(r["max"] - r["min"])
        ended[age] += 1
        if r["max"] <= gmax - HAZARD_CENSOR_DAYS:
            churned[age] += 1
    expected = {}
    for age in ended:
        at_risk = sum(c for a, c in ended.items() if a >= age)
        d = churned.get(age, 0)
        expected[age] = (
            at_risk,
            d,
            ((2 * d * 1_000_000 + at_risk) // (2 * at_risk)) / 1e6,
        )
    rows = user_hazard_curve(spark, SF).collect()
    got = {r.age: (r.n_at_risk, r.n_churned, r.hazard) for r in rows}
    assert got == expected
    ordered = sorted(got)
    risks = [got[a][0] for a in ordered]
    assert risks == sorted(risks, reverse=True)
    assert sum(got[a][1] for a in ordered) <= len(per_user)


def test_dispersion_index_matches_pure_python(spark):
    """Recompute the Fisher dispersion index over the dense daily grid
    with unbounded Python ints (pins the DECIMAL/HUGEINT micro leaf),
    plus the semantic law D ≥ 0 and the degenerate-grid guard."""
    from big_data_2021_spark_streaming_spark.plans.analytics import (
        event_dispersion_index,
    )

    ev = _events()
    day = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    counts = Counter(zip(ev["event_type"], day))
    d0, d1 = int(day.min()), int(day.max())
    expected = {}
    for t in set(ev["event_type"]):
        xs = [counts.get((t, d), 0) for d in range(d0, d1 + 1)]
        n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
        expected[t] = (
            n,
            s,
            ((2 * s * 10**6 + n) // (2 * n)) / 1e6,
            ((2 * (n * q - s * s) * 10**6 + (n - 1) * s)
             // (2 * (n - 1) * s)) / 1e6,
        )
    rows = event_dispersion_index(spark, SF).collect()
    got = {
        r.event_type: (r.n_days, r.n_events, r.daily_mean, r.dispersion)
        for r in rows
    }
    assert got == expected
    assert all(v[3] >= 0 for v in got.values())


def test_srm_check_matches_pure_python(spark):
    """Recompute the salted-hash arm assignment, per-arm stats, and
    the collapsed SRM chi-square with unbounded ints."""
    import hashlib
    import math

    from big_data_2021_spark_streaming_spark.plans.analytics import (
        experiment_srm_check,
    )

    ev = _events()
    users = {}
    stats = {}
    for _, r in ev.iterrows():
        uid = int(r["user_id"])
        if uid not in users:
            users[uid] = (
                int(
                    hashlib.md5(f"exp1:{uid}".encode()).hexdigest()[:15], 16
                )
                % 2
            )
        arm = users[uid]
        v = float(r["value"])
        vq = int(math.floor(abs(v) * 1e6 + 0.5)) * (1 if v >= 0 else -1)
        s = stats.setdefault(arm, [set(), 0, 0])
        s[0].add(uid)
        s[1] += 1
        s[2] += vq
    n_users = {a: len(s[0]) for a, s in stats.items()}
    diff = abs(n_users.get(0, 0) - n_users.get(1, 0))
    total = sum(n_users.values())
    chi2 = ((2 * diff * diff * 10**6 + total) // (2 * total)) / 1e6
    expected = {
        a: (
            n_users[a],
            s[1],
            ((2 * s[2] + s[1]) // (2 * s[1])) / 1e6,
            chi2,
        )
        for a, s in stats.items()
    }
    rows = experiment_srm_check(spark, SF).collect()
    got = {
        r.arm: (r.n_users, r.n_events, r.mean_value, r.srm_chi2)
        for r in rows
    }
    assert got == expected
    assert set(got) == {0, 1}


def test_cuped_lift_matches_pure_python(spark):
    """Recompute CUPED end-to-end with unbounded ints, including the
    signed half-away theta and adjustment leaves, plus the CUPED laws:
    theta is shared across arms and adjusted = raw when theta = 0."""
    import hashlib
    import math

    from big_data_2021_spark_streaming_spark.plans.analytics import (
        CUPED_PRE_DAYS,
        experiment_cuped_lift,
    )

    def half_away(num: int, den: int) -> int:
        if num >= 0:
            return (2 * num + den) // (2 * den)
        return -((2 * -num + den) // (2 * den))

    ev = _events()
    day = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    d0 = int(day.min())
    per_user = {}
    for (_, r), d in zip(ev.iterrows(), day):
        uid = int(r["user_id"])
        v = float(r["value"])
        vq = int(math.floor(abs(v) * 1e6 + 0.5)) * (1 if v >= 0 else -1)
        xy = per_user.setdefault(uid, [0, 0])
        xy[0 if int(d) < d0 + CUPED_PRE_DAYS else 1] += vq
    n = len(per_user)
    sx = sum(x for x, _ in per_user.values())
    sy = sum(y for _, y in per_user.values())
    sxx = sum(x * x for x, _ in per_user.values())
    sxy = sum(x * y for x, y in per_user.values())
    var_num = n * sxx - sx * sx
    theta_micro = (
        0 if var_num == 0 else half_away((n * sxy - sx * sy) * 10**6, var_num)
    )
    xbar = (2 * sx + n) // (2 * n)
    arms = {}
    for uid, (x, y) in per_user.items():
        arm = (
            int(hashlib.md5(f"exp1:{uid}".encode()).hexdigest()[:15], 16) % 2
        )
        a = arms.setdefault(arm, [0, 0, 0])
        a[0] += 1
        a[1] += x
        a[2] += y
    expected = {}
    for arm, (na, sxa, sya) in arms.items():
        ybar = (2 * sya + na) // (2 * na)
        xbar_a = (2 * sxa + na) // (2 * na)
        adj = ybar - half_away(theta_micro * (xbar_a - xbar), 10**6)
        expected[arm] = (na, ybar / 1e6, adj / 1e6, theta_micro / 1e6)
    rows = experiment_cuped_lift(spark, SF).collect()
    got = {
        r.arm: (r.n_users, r.raw_mean, r.adjusted_mean, r.theta)
        for r in rows
    }
    assert got == expected
    thetas = {v[3] for v in got.values()}
    assert len(thetas) == 1


def test_seasonal_naive_mape_matches_pure_python(spark):
    from big_data_2021_spark_streaming_spark.plans.analytics import (
        MAPE_LAG_DAYS,
        event_seasonal_naive_mape,
    )

    ev = _events()
    day = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    counts = Counter(zip(ev["event_type"], day))
    d0, d1 = int(day.min()), int(day.max())
    expected = {}
    for t in set(ev["event_type"]):
        xs = [counts.get((t, d), 0) for d in range(d0, d1 + 1)]
        leaves, errs, zeros = [], [], 0
        for i in range(MAPE_LAG_DAYS, len(xs)):
            a, p = xs[i], xs[i - MAPE_LAG_DAYS]
            errs.append(p - a)
            if a == 0:
                zeros += 1
            else:
                leaves.append((2 * abs(a - p) * 10**6 + a) // (2 * a))
        n = len(errs)
        se = sum(errs)
        bias = (
            (2 * se * 10**6 + n) // (2 * n)
            if se >= 0
            else -((2 * -se * 10**6 + n) // (2 * n))
        )
        expected[t] = (
            n,
            zeros,
            ((2 * sum(leaves) + len(leaves)) // (2 * len(leaves))) / 1e6,
            bias / 1e6,
        )
    rows = event_seasonal_naive_mape(spark, SF).collect()
    got = {
        r.event_type: (r.n_days_scored, r.n_zero_actual, r.mape, r.mean_bias)
        for r in rows
    }
    assert got == expected


def test_dau_wau_stickiness_matches_pure_python(spark):
    """Recompute DAU/WAU by brute-force trailing-7-day set union —
    independently pinning the contribution-explode rewrite — plus the
    law DAU ≤ WAU (stickiness ≤ 1)."""
    from big_data_2021_spark_streaming_spark.plans.analytics import (
        user_dau_wau_stickiness,
    )

    ev = _events()
    day = ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    active = {}
    for u, d in zip(ev["user_id"], day):
        active.setdefault(int(d), set()).add(int(u))
    d0, d1 = min(active), max(active)
    expected = {}
    for d in range(d0 + 6, d1 + 1):
        if d not in active:
            continue  # inner join on dau drops silent days
        dau = len(active[d])
        week = set()
        for k in range(7):
            week |= active.get(d - k, set())
        wau = len(week)
        expected[d] = (
            dau,
            wau,
            ((2 * dau * 10**6 + wau) // (2 * wau)) / 1e6,
        )
    rows = user_dau_wau_stickiness(spark, SF).collect()
    got = {r.day: (r.dau, r.wau, r.stickiness) for r in rows}
    assert got == expected
    assert all(d <= w for d, w, _ in got.values())


def test_anomaly_overlap_consistent_with_detectors(spark):
    """The overlap report's counts must equal direct recomputation
    from the two detector frames, and the Jaccard must match the
    half-up micro of |A∩B|/|A∪B|."""
    from big_data_2021_spark_streaming_spark.plans.analytics import (
        anomaly_detector_overlap,
        event_ewma_spikes,
        value_zscore_anomalies,
    )

    a = {r.event_id for r in value_zscore_anomalies(spark, SF).collect()}
    b = {r.event_id for r in event_ewma_spikes(spark, SF).collect()}
    row = anomaly_detector_overlap(spark, SF).collect()[0]
    assert (row.n_zscore, row.n_ewma, row.n_both) == (
        len(a),
        len(b),
        len(a & b),
    )
    union = len(a | b)
    assert row.jaccard == ((2 * len(a & b) * 10**6 + union) // (2 * union)) / 1e6


def test_discount_tax_independence_matches_pure_python(spark):
    """Recompute the discount×tax chi-square with unbounded ints and
    check the shared total equals the sum of per-level contributions."""
    import math

    import pandas as pd

    from big_data_2021_spark_streaming_spark.plans.analytics import (
        discount_tax_independence,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")

    def pct(x: float) -> int:
        return int(math.floor(abs(x) * 100 + 0.5)) * (1 if x >= 0 else -1)

    cells = Counter(
        (pct(float(d)), pct(float(t)))
        for d, t in zip(li["l_discount"], li["l_tax"])
    )
    rows = Counter()
    cols = Counter()
    for (d, t), o in cells.items():
        rows[d] += o
        cols[t] += o
    n = sum(cells.values())
    level_micro = Counter()
    for (d, t), o in cells.items():
        num = o * n - rows[d] * cols[t]
        den = n * rows[d] * cols[t]
        level_micro[d] += (2 * num * num * 10**6 + den) // (2 * den)
    total = sum(level_micro.values())
    dof = (len(rows) - 1) * (len(cols) - 1)
    expected = {
        d: (lm / 1e6, total / 1e6, dof) for d, lm in level_micro.items()
    }
    out = discount_tax_independence(spark, SF).collect()
    got = {r.disc_pct: (r.chi2_contrib, r.chi2_total, r.dof) for r in out}
    assert got == expected
