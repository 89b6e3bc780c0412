#!/usr/bin/env python3
"""Driver-simulation: run each oracle_sql.json query in DuckDB against the
sfDir parquet tables and compare with the Spark parquet dumps (row count,
column names, stringified values after canonical sort)."""
import duckdb, glob, json, sys

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")

oracles = json.load(open(f"{vout}/oracle_sql.json"))
fails = []
for name in sorted(oracles):
    files = glob.glob(f"{vout}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fails.append(name); continue
    got = con.sql(f"select * from read_parquet({files})").df()
    try:
        exp = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails.append(name); continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(g.columns)} duck={list(e.columns)}")
        fails.append(name); continue
    gs = g.astype(str).sort_values(list(g.columns)).reset_index(drop=True)
    es = e.astype(str).sort_values(list(e.columns)).reset_index(drop=True)
    if gs.shape != es.shape:
        print(f"{name}: SHAPE MISMATCH spark={gs.shape} duck={es.shape}")
        fails.append(name); continue
    if not (gs.values == es.values).all():
        import numpy as np
        idx = np.argwhere(gs.values != es.values)[:5]
        print(f"{name}: VALUE MISMATCH ({len(idx)}+ cells)")
        for r, c in idx:
            print(f"   row {r} col {gs.columns[c]}: spark={gs.iloc[r,c]!r} duck={es.iloc[r,c]!r}")
        fails.append(name); continue
    print(f"{name}: OK ({gs.shape[0]} rows)")
nq = len([n for n in oracles if glob.glob(f'{vout}/{n}')])
print(f"\n{len(oracles) - len(fails)}/{len(oracles)} oracles match")
sys.exit(1 if fails else 0)
