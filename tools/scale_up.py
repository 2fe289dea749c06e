"""Synthesize a larger scale factor from an existing testdata dir.

The graded scale factors (sf0.01, sf0.1) sample only a slice of the
cross-engine rounding-boundary space: a ratio that never lands on a
.xx5 boundary at sf0.1 can land there at 4× the data (that is exactly
how the sf0.1 sweep caught the quality-score ROUND divergence the
graded sf0.01 missed). This tool unions K deterministic copies of a
source sf dir — keys offset so referential integrity holds across
copies, numeric columns perturbed per-copy so the larger corpus
produces NEW aggregate residues rather than scaled-up old ones — and
writes plain parquet the oracle gate can point at:

    python tools/scale_up.py /root/testdata/sf0.1 /tmp/sfbig0.4 4
    python tools/check_oracle.py /tmp/sfbig0.4

Dimension tables (region, nation) are copied as-is; every other
table's keys shift by copy_index * KEY_OFFSET, mirroring how a real
multi-tenant corpus concatenates shards. All perturbations are pure
functions of (copy index, row keys) — rerunning produces identical
bytes, and both engines read the same files, so the gate still proves
cross-engine parity, just over a harder value distribution.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

KEY_OFFSET = 10_000_000

DIMENSIONS = ("region", "nation")
FACTS = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _copy(table: str, df: pd.DataFrame, k: int) -> pd.DataFrame:
    if k == 0:
        return df
    out = df.copy()
    off = k * KEY_OFFSET
    if table == "customer":
        out["c_custkey"] += off
        out["c_name"] = out["c_name"] + f"-{k}"
        out["c_acctbal"] = (out["c_acctbal"] * 100 + k).round() / 100
    elif table == "supplier":
        out["s_suppkey"] += off
        out["s_name"] = out["s_name"] + f"-{k}"
        out["s_acctbal"] = (out["s_acctbal"] * 100 + k).round() / 100
    elif table == "part":
        out["p_partkey"] += off
        out["p_name"] = out["p_name"] + f"-{k}"
        out["p_retailprice"] = (out["p_retailprice"] * 100 + k).round() / 100
    elif table == "orders":
        out["o_orderkey"] += off
        out["o_custkey"] += off
        out["o_totalprice"] = (out["o_totalprice"] * 100 + k).round() / 100
        out["o_orderdate"] = out["o_orderdate"] + pd.Timedelta(seconds=k)
    elif table == "lineitem":
        out["l_orderkey"] += off
        out["l_partkey"] += off
        out["l_suppkey"] += off
        # fresh cent-rounding residues per copy: a third decimal digit
        # varying by line number exercises boundaries the source's
        # 2-decimal prices never reach
        out["l_extendedprice"] = (
            out["l_extendedprice"] * 1000 + k * (out["l_linenumber"] % 7 + 1)
        ).round() / 1000
        out["l_shipdate"] = out["l_shipdate"] + pd.Timedelta(seconds=k)
    elif table == "events":
        out["event_id"] += off
        out["user_id"] += off
        out["ts"] = out["ts"] + pd.Timedelta(seconds=k)
        out["value"] = (
            out["value"] * 10000 + k * (out["event_id"] % 13 + 1)
        ).round() / 10000
    elif table == "documents":
        suffix = f" xq{k}"
        out["doc_id"] += off
        out["text"] = out["text"] + suffix
        out["n_chars"] = out["n_chars"] + len(suffix)
    elif table == "embeddings":
        out["vec_id"] += off
        out["embedding"] = out["embedding"].map(
            lambda v: [float(x) + k * 1e-4 for x in v]
        )
    return out


def scale_up(src: str, dst: str, factor: int) -> None:
    dst_path = Path(dst)
    dst_path.mkdir(parents=True, exist_ok=True)
    for table in DIMENSIONS:
        pq.write_table(
            pq.read_table(f"{src}/{table}.parquet"), dst_path / f"{table}.parquet"
        )
        print(f"{table}: copied")
    for table in FACTS:
        source = pq.read_table(f"{src}/{table}.parquet")
        df = source.to_pandas()
        big = pd.concat(
            [_copy(table, df, k) for k in range(factor)], ignore_index=True
        )
        # preserve the source schema exactly (int32 widths, float32
        # embedding lists, µs timestamps) — dtype drift here would test
        # a different read path than the graded dirs
        out = pa.Table.from_pandas(big, schema=source.schema, preserve_index=False)
        pq.write_table(out, dst_path / f"{table}.parquet")
        print(f"{table}: {len(df)} -> {len(big)}")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit("usage: scale_up.py <src_sf_dir> <dst_dir> <factor>")
    scale_up(sys.argv[1], sys.argv[2], int(sys.argv[3]))
