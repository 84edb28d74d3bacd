#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracles and diff exactly. Usage:
    python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(spark_dir + "/*.parquet"))])
        ddf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    import datetime
    for c in sdf.columns:
        if sdf[c].dtype == object and sdf[c].map(lambda v: isinstance(v, datetime.date) or v is None).all():
            sdf[c] = pd.to_datetime(sdf[c])
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    if list(sdf.columns) != list(ddf.columns):
        print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(ddf.columns)}"); fails += 1; continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}"); fails += 1; continue
    sdf = sdf.sort_values(by=list(sdf.columns), na_position="first").reset_index(drop=True)
    ddf = ddf.sort_values(by=list(ddf.columns), na_position="first").reset_index(drop=True)
    bad = []
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            eq = (a.isna() & b.isna()) | (a.astype("float64").to_numpy() == b.astype("float64").to_numpy())
        else:
            eq = (a.isna() & b.isna()) | (a.astype(object).to_numpy() == b.astype(object).to_numpy())
        neq = (~eq).sum()
        if neq:
            bad.append((c, int(neq)))
    if bad:
        print(f"FAIL {name}: value mismatches {bad} of {len(sdf)} rows")
        c = bad[0][0]
        m = ~((sdf[c].isna() & ddf[c].isna()) | (sdf[c].astype(object).to_numpy() == ddf[c].astype(object).to_numpy()))
        print(pd.concat([sdf[m].head(3).add_suffix("_spark"), ddf[m].head(3).add_suffix("_duck")], axis=1).T)
        fails += 1
    else:
        print(f"OK   {name}: {len(sdf)} rows")

# rows-only queries (no oracle)
for d in sorted(glob.glob(outdir + "/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        try:
            n = sum(len(pd.read_parquet(f)) for f in glob.glob(d + "*.parquet"))
            print(f"ROWS {name}: {n} rows (no oracle)")
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
