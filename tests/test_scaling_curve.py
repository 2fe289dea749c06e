"""Unit tests for tools/scaling_curve.py (the data-scaling exponent
report: bench_diff catches regressions over TIME at one SF, this
catches super-linear growth over DATA across SFs)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _bench_line(queries, path):
    path.write_text(
        json.dumps(
            {
                "metric": "registry_total_runtime",
                "unit": "sec",
                "sf": 0.1,
                "queries": queries,
                "value": round(sum(v for v in queries.values() if v >= 0), 3),
            }
        )
    )


def _run(*argv):
    return subprocess.run(
        [sys.executable, str(REPO / "tools" / "scaling_curve.py"), *argv],
        capture_output=True,
        text=True,
    )


def test_flags_quadratic_not_linear_or_noise(tmp_path):
    lo, hi = tmp_path / "lo.json", tmp_path / "hi.json"
    # 2x data: q_lin ~doubles (alpha~1), q_quad 4x (alpha=2),
    # q_noise quadruples but stays under the 2s floor, q_err excluded
    _bench_line({"q_lin": 2.0, "q_quad": 2.0, "q_noise": 0.1, "q_err": -1.0}, lo)
    _bench_line({"q_lin": 4.2, "q_quad": 8.0, "q_noise": 0.4, "q_err": 3.0}, hi)
    r = _run(f"{lo}=0.4", f"{hi}=0.8", "--fail")
    assert r.returncode == 1, r.stdout + r.stderr
    assert "q_quad" in r.stdout and "SUPER-LINEAR" in r.stdout
    assert "q_noise *SUPER" not in r.stdout
    assert "q_lin *SUPER" not in r.stdout


def test_passes_on_linear_scaling(tmp_path):
    lo, hi = tmp_path / "lo.json", tmp_path / "hi.json"
    _bench_line({"a": 3.0, "b": 1.0}, lo)
    _bench_line({"a": 6.5, "b": 2.1}, hi)
    r = _run(f"{lo}=0.8", f"{hi}=1.6", "--fail")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PASS" in r.stdout


def test_uses_largest_scale_pair(tmp_path):
    # three runs: the noisy small->mid pair must not drive the verdict;
    # only mid->big (where overhead matters least) is fitted
    small, mid, big = (tmp_path / n for n in ("s.json", "m.json", "b.json"))
    _bench_line({"q": 0.2}, small)
    _bench_line({"q": 3.0}, mid)  # 15x on 4x data — overhead artifact
    _bench_line({"q": 6.1}, big)  # ~2x on 2x data — linear
    r = _run(f"{small}=0.1", f"{mid}=0.4", f"{big}=0.8", "--fail")
    assert r.returncode == 0, r.stdout + r.stderr


def test_recorded_round5_curve_passes_the_exponent_gate():
    """Pin the round-5 recorded scaling artifacts: the committed
    sf0.1 / rep-x4 / rep-x16 bench recordings must fit no query above
    alpha 1.5 on their largest scale pair. This is the artifact the
    BASELINE.md scaling-study entry points at — if a future change
    replaces a recording with one that hides a super-linear query, the
    gate fails here instead of silently in prose. (It found
    dedup_semantic at alpha ~1.9 before the K-proportional fix.)"""
    triples = [
        # the study that caught the alpha-1.9 dedup_semantic (post-fix
        # recordings, pre rank-seed rewrite)
        ("sf0.1_r05b.json", "sfrep0.4_r05.json", "sfrep1.6_r05.json"),
        # re-recorded on the final round-5 HEAD (rank-based seeds,
        # cached widened corpus)
        ("sf0.1_r05e.json", "sfrep0.4_r05b.json", "sfrep1.6_r05b.json"),
    ]
    for names in triples:
        runs = [
            (REPO / "bench_runs" / n, sf)
            for n, sf in zip(names, (0.1, 0.4, 1.6))
        ]
        assert all(p.exists() for p, _ in runs), names
        r = _run(*[f"{p}={sf}" for p, sf in runs], "--fail")
        assert r.returncode == 0, names + (r.stdout, r.stderr)
        assert "PASS" in r.stdout
