#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query dumped by
graft.Verify, run its DuckDB oracle SQL on the same parquet tables and
compare (schema-insensitively: columns sorted by name, rows sorted, values
stringified). Usage: validate_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify with float normalization
    def fmt(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)
    out = df.apply(lambda c: c.map(fmt))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

fails, passes = [], []
for name in sorted(oracle):
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        fails.append((name, "NO SPARK OUTPUT")); continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in
                         glob.glob(os.path.join(spark_path, "*.parquet"))],
                        ignore_index=True)
    except Exception as e:
        fails.append((name, f"spark read: {e}")); continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"duckdb: {e}")); continue
    cs, co = canon(sdf), canon(odf)
    if list(cs.columns) != list(co.columns):
        fails.append((name, f"cols spark={list(cs.columns)} oracle={list(co.columns)}")); continue
    if len(cs) != len(co):
        fails.append((name, f"rows spark={len(cs)} oracle={len(co)}")); continue
    if not cs.equals(co):
        diff = (cs != co).any(axis=1)
        idx = diff[diff].index[:3]
        detail = "; ".join(f"row{j}: spark={cs.loc[j].tolist()} oracle={co.loc[j].tolist()}" for j in idx)
        fails.append((name, f"values differ ({int(diff.sum())} rows): {detail}")); continue
    passes.append((name, len(cs)))

for n, r in passes:
    print(f"PASS {n} ({r} rows)")
for n, m in fails:
    print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
