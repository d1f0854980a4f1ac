#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run the oracle SQL in DuckDB over the same sf dir and compare
(sorted columns, sorted rows, exact values after the queries' own rounding).

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, math, os, sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: ints -> int64, floats -> float64, rest -> str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        else:
            out[c] = s.astype(str)
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(outdir: str, sfdir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path):
            continue
        got = pd.read_parquet(path)
        if name not in oracle:
            print(f"SKIP {name}: rows={len(got)} (no oracle)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_bad += 1
            continue
        if g.equals(e):
            print(f"OK   {name}: rows={len(g)}")
            n_ok += 1
        else:
            diff = (g != e) & ~(g.isna() & e.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(g)} mismatched rows")
            with pd.option_context("display.width", 200):
                print("  got:", g[bad].head(3).to_dict("records"))
                print("  exp:", e[bad].head(3).to_dict("records"))
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail, {n_skip} rows-only")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
