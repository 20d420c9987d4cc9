#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
reads each query's parquet dump + oracle_sql.json, runs the oracle SQL in
DuckDB against the same testdata parquet tables, and compares strictly
(columns sorted by name, rows sorted by all columns, exact cell equality).
Stricter-or-equal to the driver's hash compare, so a PASS here should mean
a PASS there.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # unify numpy/arrow scalar types for comparison
        if pd.api.types.is_extension_array_dtype(df[c]):
            df[c] = df[c].astype(object)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return b is None or (isinstance(b, float) and math.isnan(b))
    if b is None or (isinstance(b, float) and math.isnan(b)):
        return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def stringify_mismatch(g: pd.DataFrame, w: pd.DataFrame):
    """The driver hashes STRINGIFIED cells, so a Spark DECIMAL column
    ("157.00") vs a DuckDB float ("157.0"), or a DuckDB HUGEINT sum that
    pandas renders as float ("840.0") vs Spark's long ("840"), hash-
    mismatches even when every value is numerically equal (round-9
    postmortem: 6 such gates). Replicate that strictness here: any cell
    whose str() differs is a failure even if cells_equal passes."""
    for c in g.columns:
        sg = g[c].map(lambda x: "<null>" if x is None or (
            isinstance(x, float) and math.isnan(x)) else str(x))
        sw = w[c].map(lambda x: "<null>" if x is None or (
            isinstance(x, float) and math.isnan(x)) else str(x))
        bad = sg[sg != sw]
        if len(bad):
            i = bad.index[0]
            return (f"col {c}: {len(bad)} STRINGIFY mismatches (driver "
                    f"hash would differ), first at row {i}: "
                    f"{sg.iloc[i]!r} vs {sw.iloc[i]!r}")
    return None


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fp:
        oracles = json.load(fp)

    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        got = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(f"{qdir}/*.parquet"))],
            ignore_index=True)
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(got)}")
            continue
        want = con.execute(oracles[name]).df()
        g, w = normalize(got), normalize(want)
        status, detail = "PASS", ""
        if list(g.columns) != list(w.columns):
            status, detail = "FAIL", f"columns {list(g.columns)} vs {list(w.columns)}"
        elif len(g) != len(w):
            status, detail = "FAIL", f"rows {len(g)} vs {len(w)}"
        else:
            for c in g.columns:
                bad = [i for i in range(len(g))
                       if not cells_equal(g[c].iloc[i], w[c].iloc[i])]
                if bad:
                    i = bad[0]
                    status = "FAIL"
                    detail = (f"col {c}: {len(bad)} mismatches, first at row {i}: "
                              f"{g[c].iloc[i]!r} vs {w[c].iloc[i]!r}")
                    break
            if status == "PASS":
                sdetail = stringify_mismatch(g, w)
                if sdetail is not None:
                    status, detail = "FAIL", sdetail
        print(f"[{status}] {name} {detail}")
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
