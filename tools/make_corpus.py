"""Deterministic sweep-corpus generators.

The per-round degenerate sweeps (BASELINE.md; they have caught real
defects every round since r03) run the full oracle gate over corpora
the graded generator never produces. This tool makes those corpora
reproducible instead of ad-hoc:

    python tools/make_corpus.py nulls  SRC DST PCT   # NULL-density ramp
    python tools/make_corpus.py single SRC DST       # one row per table

``nulls`` NULLs out the three columns the graded generator never
nulls — events.value, events.props, documents.lang — on a
deterministic id-hash so PCT=10 reproduces round 7's /tmp/sfnulls and
PCT=50+ stresses the round-8 NULL gates. ``single`` keeps exactly one
row per table (min primary key), the n=1 boundary of every variance /
quantile / (n−1) denominator; foreign keys generally dangle, which is
itself a degenerate case the join queries must survive.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# deterministic row selector: md5 of the row id, mod 100 — stable
# across runs and engines, uncorrelated with the id's own structure
def _pick(col: str, pct: int) -> str:
    return (
        f"(CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8) AS BIGINT)"
        f" % 100) < {pct}"
    )


def make_nulls(src: str, dst: str, pct: int) -> None:
    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            sel = (
                "SELECT * REPLACE ("
                f" CASE WHEN {_pick('event_id', pct)} THEN NULL"
                "      ELSE value END AS value,"
                f" CASE WHEN {_pick('event_id + 1', pct)} THEN NULL"
                "      ELSE props END AS props)"
                f" FROM read_parquet('{src}/{t}.parquet')"
            )
        elif t == "documents":
            sel = (
                "SELECT * REPLACE ("
                f" CASE WHEN {_pick('doc_id', pct)} THEN NULL"
                "      ELSE lang END AS lang)"
                f" FROM read_parquet('{src}/{t}.parquet')"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{src}/{t}.parquet')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    print(f"wrote {out} (pct={pct})")


_PK = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "lineitem": "l_orderkey, l_linenumber",
    "events": "event_id", "documents": "doc_id", "embeddings": "vec_id",
}


def make_single(src: str, dst: str) -> None:
    out = Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')"
            f" ORDER BY {_PK[t]} LIMIT 1)"
            f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"wrote {out} (1 row per table)")


def main() -> int:
    mode = sys.argv[1]
    if mode == "nulls":
        make_nulls(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    elif mode == "single":
        make_single(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
