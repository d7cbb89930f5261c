#!/usr/bin/env python3
"""Local emulation of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]
Reads <out>/<name>/ parquet (Spark result) + <out>/oracle_sql.json, runs each
oracle against the sf parquet tables in DuckDB, and compares: columns sorted
by name, rows sorted, exact equality (with float bit-diff report).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

out = sys.argv[1]
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fails = 0
for name in sorted(oracle):
    d = os.path.join(out, name)
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}"); fails += 1; continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle errored: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    # normalize: sort rows by all columns for order-insensitive compare
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            elif df[c].dtype == object:
                df[c] = df[c].apply(lambda v: str(v))
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    g, e = norm(got), norm(exp)
    bad = []
    for c in g.columns:
        gv, ev = g[c], e[c]
        # dtype parity: the driver's hash is type-sensitive — an int column
        # on one side vs float on the other (e.g. `x / 2` DOUBLE vs `x // 2`
        # BIGINT, the q317 slip) passes a float-coerced value compare but
        # fails the driver. Flag it here before submission.
        g_int = pd.api.types.is_integer_dtype(gv)
        e_int = pd.api.types.is_integer_dtype(ev)
        g_flt = pd.api.types.is_float_dtype(gv)
        e_flt = pd.api.types.is_float_dtype(ev)
        if (g_int and e_flt) or (g_flt and e_int):
            bad.append(f"{c}: dtype mismatch {gv.dtype} vs {ev.dtype} "
                       f"(int/float parity — driver hash is type-sensitive)")
            continue
        if g_flt or e_flt:
            gv = gv.astype(float); ev = ev.astype(float)
            neq = ~((gv == ev) | (gv.isna() & ev.isna()))
            if neq.any():
                md = float(np.nanmax(np.abs(gv[neq] - ev[neq])))
                bad.append(f"{c}: {int(neq.sum())} diffs, maxabs={md:.3e}")
        else:
            neq = ~((gv == ev) | (gv.isna() & ev.isna()))
            if neq.any():
                i = int(neq.idxmax())
                bad.append(f"{c}: {int(neq.sum())} diffs, e.g. row{i}: {gv[i]!r} vs {ev[i]!r}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad)); fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")

# rows-only queries (no oracle)
for d in sorted(glob.glob(os.path.join(out, "*"))):
    name = os.path.basename(d)
    if os.path.isdir(d) and name not in oracle:
        n = sum(len(pd.read_parquet(f)) for f in glob.glob(os.path.join(d, "*.parquet")))
        print(f"ROWS {name}: {n} rows (no oracle)")

sys.exit(1 if fails else 0)
