#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: read each
outDir/<name> parquet (Spark output), run the matching oracle SQL in
DuckDB over the sf tables, and compare as unordered multisets with
columns sorted by name. Usage: selfcheck.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
print(f"duckdb=={duckdb.__version__}")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    path = f"{out}/{name}"
    if not os.path.isdir(path):
        fails.append((name, "spark output missing")); continue
    got = pd.read_parquet(path)
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"cols spark={list(got.columns)} oracle={list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows spark={len(got)} oracle={len(exp)}")); continue
    g = got.sort_values(by=list(got.columns), na_position="first").reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns), na_position="first").reset_index(drop=True)
    # EXACT compare (the driver hashes byte representations): floats
    # must be bit-identical after a shared -0.0 -> +0.0 normalization
    # (the only representational split both engines agree is
    # value-equal). np.isclose here would be WEAKER than the shipping
    # hash gate and hide -0.0 / round-boundary splits.
    ok = True
    for c in g.columns:
        gc, ec = g[c], e[c]
        if gc.dtype.kind == "f" or ec.dtype.kind == "f":
            import numpy as np
            ga = gc.astype(float).to_numpy()
            ea = ec.astype(float).to_numpy()
            ga = np.where(ga == 0.0, 0.0, ga)  # -0.0 -> +0.0
            ea = np.where(ea == 0.0, 0.0, ea)
            same = (ga.view(np.uint64) == ea.view(np.uint64)) | \
                   (np.isnan(ga) & np.isnan(ea))
            if not same.all():
                bad = (~same).nonzero()[0][:3]
                fails.append((name, f"col {c} diff at rows {bad}: spark={gc.iloc[bad].tolist()} oracle={ec.iloc[bad].tolist()}"))
                ok = False; break
        else:
            if not gc.astype(str).equals(ec.astype(str)):
                diff = gc.astype(str) != ec.astype(str)
                bad = diff[diff].index[:3]
                fails.append((name, f"col {c} diff at rows {list(bad)}: spark={gc.loc[bad].tolist()} oracle={ec.loc[bad].tolist()}"))
                ok = False; break
    if ok and (name, ) not in fails:
        print(f"  OK  {name} ({len(got)} rows)")
for name, why in fails:
    print(f"FAIL  {name}: {why}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
