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

Two modes, per the two questions a synthetic scale-up can answer:

* ``dense`` (default): document copies stay near-duplicates of their
  source (a one-token suffix), so every dup cluster grows K-fold and
  pair frames grow ~K² — the ADVERSARIAL dup-dense corpus. Use it to
  prove robustness (it is what drove the round-5 pinned candidate
  broadcast past Spark's 8 GiB hard limit), not to read scaling
  exponents: pair-based operators' OUTPUT grows quadratically here.
* ``rep`` (representative): document copies get a copy-marker token
  interleaved every second word and embeddings a per-copy orthogonal
  sign-flip, so cross-copy similarity collapses and per-copy dup
  density matches the source. Time-vs-data exponents measured on this
  corpus (tools/scaling_curve.py) are interpretable: the workload
  grows K-fold, not K²-fold.

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


def _rep_text(text: str, k: int) -> str:
    """Rewrite every word with a copy-specific suffix (w → "w·qK").

    The map is INJECTIVE on the vocabulary, so every within-copy token-
    set / shingle-set Jaccard is preserved bit-for-bit (per-copy dup
    density = the source corpus's), while cross-copy vocabularies are
    DISJOINT, so cross-copy Jaccard is exactly 0 and pair frames grow
    K-fold, not K²-fold — the precondition for reading time-vs-data
    exponents off this corpus. This mirrors a real multi-shard corpus
    where shards are distinct domains, the opposite pole from the
    dense mode's every-doc-has-K-twins crawl."""
    suffix = f"q{k}"
    return " ".join(w + suffix for w in text.split())


def _rep_flip(vec: list[float], k: int) -> list[float]:
    """Per-copy deterministic sign flip of ~half the dimensions — an
    orthogonal transform, so every WITHIN-copy cosine is bit-identical
    to the source while cross-copy cosines collapse toward 0 (the dims
    whose flips differ contribute with opposite signs)."""
    return [
        -x if ((d * 2654435761 + k * 40503) % 7) < 3 else x
        for d, x in enumerate(vec)
    ]


def _name_marker(k: int, mode: str) -> str:
    """Per-copy name suffix.

    dense: "-{k}" — cross-copy names sit at levenshtein 1 ("X-1" vs
    "X-2"), so every deletion-neighborhood-blocked operator
    (fuzzy_name_matches, linkage_fs_weights) sees each base name gain
    K−1 twins and its pair frame grow ~K²: the adversarial corpus, by
    design.

    rep: every digit of k DOUBLED ("-11", "-4499") — any two distinct
    copies then differ in ≥2 character positions, so cross-copy
    levenshtein ≥ 2 and single-deletion blocking admits no cross-copy
    match: per-copy fuzzy-pair density equals the source corpus's, the
    mode's stated contract. The round-5 ×50 sweep caught the old
    shared "-{k}" scheme inflating the linkage pair frame ~1200× per
    base name (>1 GiB of result rows — the gate's collect died), a
    tool artifact no real multi-shard corpus reproduces.
    """
    digits = "".join(d * 2 for d in str(k))
    return f"-{digits}" if mode == "rep" else f"-{k}"


def _copy(table: str, df: pd.DataFrame, k: int, mode: str = "dense") -> pd.DataFrame:
    if k == 0:
        return df
    out = df.copy()
    off = k * KEY_OFFSET
    mark = _name_marker(k, mode)
    if mode == "rep":
        if table == "documents":
            out["doc_id"] += off
            out["text"] = out["text"].map(lambda t: _rep_text(t, k))
            out["n_chars"] = out["text"].str.len()
            return out
        if table == "embeddings":
            out["vec_id"] += off
            out["embedding"] = out["embedding"].map(
                lambda v: _rep_flip([float(x) for x in v], k)
            )
            return out
        # every other table: the dense perturbation is already
        # representative (keys offset, numerics re-residued)
    if table == "customer":
        out["c_custkey"] += off
        out["c_name"] = out["c_name"] + mark
        out["c_acctbal"] = (out["c_acctbal"] * 100 + k).round() / 100
    elif table == "supplier":
        out["s_suppkey"] += off
        out["s_name"] = out["s_name"] + mark
        out["s_acctbal"] = (out["s_acctbal"] * 100 + k).round() / 100
    elif table == "part":
        out["p_partkey"] += off
        out["p_name"] = out["p_name"] + mark
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


def scale_up(src: str, dst: str, factor: int, mode: str = "dense") -> None:
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
            [_copy(table, df, k, mode) for k in range(factor)], ignore_index=True
        )
        # preserve the source schema exactly (int32 widths, float32
        # embedding lists, µs timestamps) — dtype drift here would test
        # a different read path than the graded dirs
        out = pa.Table.from_pandas(big, schema=source.schema, preserve_index=False)
        pq.write_table(out, dst_path / f"{table}.parquet")
        print(f"{table}: {len(df)} -> {len(big)}")


if __name__ == "__main__":
    if len(sys.argv) not in (4, 5) or (
        len(sys.argv) == 5 and sys.argv[4] not in ("dense", "rep")
    ):
        sys.exit("usage: scale_up.py <src_sf_dir> <dst_dir> <factor> [dense|rep]")
    scale_up(
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        sys.argv[4] if len(sys.argv) == 5 else "dense",
    )
