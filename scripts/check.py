#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Runs DuckDB oracle SQL from oracle_sql.json against the sf parquet tables
and compares with the Spark results dumped by graft.Verify.

Usage: python3 scripts/check.py [sf_dir] [verify_out_dir]
(run `sbt "runMain graft.Verify <sf_dir> <out_dir>"` first)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

with open(f"{OUT}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name in sorted(os.listdir(OUT)):
    d = os.path.join(OUT, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output parquet")
        n_fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
    if name not in oracles:
        print(f"OK?  {name}: rows-only check, {len(spark_df)} rows "
              f"({'PASS' if len(spark_df) > 0 else 'FAIL: empty'})")
        if len(spark_df) > 0: n_pass += 1
        else: n_fail += 1
        continue
    try:
        oracle_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    s, o = canon(spark_df), canon(oracle_df)
    if list(s.columns) != list(o.columns):
        print(f"FAIL {name}: columns differ spark={list(s.columns)} oracle={list(o.columns)}")
        n_fail += 1
        continue
    if len(s) != len(o):
        print(f"FAIL {name}: row counts differ spark={len(s)} oracle={len(o)}")
        n_fail += 1
        continue
    # exact value compare (driver hashes values → must be exact)
    mismatch = None
    for c in s.columns:
        sv, ov = s[c], o[c]
        # driver's hash is type-KIND-sensitive: a DuckDB HUGEINT (→ float64 or
        # object in fetchdf) vs Spark int64 fails the driver even when values
        # match. Width/resolution differences (int32 vs int64, datetime ns vs
        # us) are proven tolerated (round-1 hash-green queries had them), so
        # compare pandas dtype *kind* only (i/u merged as integer).
        ks, ko = sv.dtype.kind, ov.dtype.kind
        ks = 'i' if ks == 'u' else ks
        ko = 'i' if ko == 'u' else ko
        if ks != ko:
            mismatch = (c, f"dtype kind differs spark={sv.dtype} oracle={ov.dtype} "
                           f"(driver hash is type-sensitive; cast the oracle)")
            break
        try:
            eq = (sv.astype(object).where(pd.notna(sv), None) ==
                  ov.astype(object).where(pd.notna(ov), None)) | (pd.isna(sv) & pd.isna(ov))
        except Exception as e:
            mismatch = (c, f"dtype compare error {e}")
            break
        if not eq.all():
            i = int(eq.idxmin())
            mismatch = (c, f"row {i}: spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r} "
                           f"(dtypes {sv.dtype}/{ov.dtype})")
            break
    if mismatch:
        print(f"FAIL {name}: col {mismatch[0]}: {mismatch[1]}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(s)} rows)")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
