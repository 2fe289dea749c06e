"""Per-query scaling-exponent report across bench recordings.

The per-round bench gate (``bench_diff.py``) catches *regressions over
time* at one scale factor; this tool catches the other failure mode —
a query whose cost grows super-linearly *with data*. Feed it two or
more ``bench.py`` recordings taken at different scale factors and it
fits, per query, the empirical exponent

    alpha = log(t_hi / t_lo) / log(sf_hi / sf_lo)

over each consecutive scale pair. alpha ~ 1 is linear (the design goal
for every operator in this engine), alpha ~ 2 means the query found a
quadratic path (an unpruned pair join, a window without a partition
bound) that small-scale benches hide inside fixed overhead.

Sub-second timings are dominated by per-query session overhead, so the
exponent is only meaningful once the larger-scale time clears
``--min-sec`` (default 2 s). Queries flagged super-linear are those
with alpha > ``--max-alpha`` (default 1.5 — sort-heavy plans are
n log n, and first-touch cache attribution adds noise, so demanding
exactly 1.0 would cry wolf) on the LARGEST scale pair.

Usage::

    python tools/scaling_curve.py FILE=SF [FILE=SF ...]
        [--min-sec 2.0] [--max-alpha 1.5] [--fail]

Example::

    python tools/scaling_curve.py bench_runs/sf0.1_r05b.json=0.1 \\
        /tmp/bench_sf0.8.json=0.8 /tmp/bench_sf1.6.json=1.6
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_diff import load_timings


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("runs", nargs="+", metavar="FILE=SF")
    ap.add_argument("--min-sec", type=float, default=2.0)
    ap.add_argument("--max-alpha", type=float, default=1.5)
    ap.add_argument(
        "--fail",
        action="store_true",
        help="exit 1 if any query is flagged super-linear",
    )
    args = ap.parse_args()

    runs: list[tuple[float, dict[str, float]]] = []
    for spec in args.runs:
        path, _, sf = spec.rpartition("=")
        if not path:
            raise SystemExit(f"{spec}: expected FILE=SF")
        runs.append((float(sf), load_timings(path)))
    runs.sort(key=lambda r: r[0])
    if len(runs) < 2:
        raise SystemExit("need at least two recordings")

    # exponent per query over the LARGEST consecutive pair (the pair
    # where fixed overhead matters least), plus the full trajectory
    # for the report
    (sf_lo, lo), (sf_hi, hi) = runs[-2], runs[-1]
    data_ratio = sf_hi / sf_lo
    shared = sorted(set(lo) & set(hi))
    rows = []
    for name in shared:
        t_lo, t_hi = lo[name], hi[name]
        if t_lo <= 0 or t_hi <= 0:
            continue
        alpha = math.log(t_hi / t_lo) / math.log(data_ratio)
        rows.append((alpha, t_lo, t_hi, name))
    rows.sort(reverse=True)

    flagged = [
        r for r in rows if r[0] > args.max_alpha and r[2] >= args.min_sec
    ]
    print(
        f"scaling_curve: {len(shared)} shared queries, "
        f"sf{sf_lo} -> sf{sf_hi} ({data_ratio:.1f}x data); "
        f"total {sum(lo[n] for n in shared if lo[n] > 0 and hi[n] > 0):.1f}s -> "
        f"{sum(hi[n] for n in shared if lo[n] > 0 and hi[n] > 0):.1f}s"
    )
    print(f"{'alpha':>6}  {'t_lo':>7}  {'t_hi':>7}  query")
    for alpha, t_lo, t_hi, name in rows[:25]:
        mark = " *SUPER-LINEAR*" if (alpha, t_lo, t_hi, name) in flagged else ""
        print(f"{alpha:6.2f}  {t_lo:7.2f}  {t_hi:7.2f}  {name}{mark}")
    if len(rows) > 25:
        print(f"  ... {len(rows) - 25} more (all below)")
    if flagged:
        print(
            f"scaling_curve: {len(flagged)} queries exceed "
            f"alpha {args.max_alpha} at >= {args.min_sec}s — "
            + ("FAIL" if args.fail else "investigate")
        )
        return 1 if args.fail else 0
    print(f"scaling_curve: no query exceeds alpha {args.max_alpha} — PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
