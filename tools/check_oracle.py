#!/usr/bin/env python3
"""Local differential check mimicking the driver's t2 gate:
runs DuckDB oracle SQL against the sf parquet tables and compares to the
parquet dumped by `graft.Verify`. Usage:
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        fails.append(name); print(f"FAIL {name}: no spark output"); continue
    spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
    duck_df = canon(con.execute(oracle[name]).df())
    ok = True
    if list(spark_df.columns) != list(duck_df.columns):
        ok = False
        print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
    elif len(spark_df) != len(duck_df):
        ok = False
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
    else:
        for c in spark_df.columns:
            a, b = spark_df[c].values, duck_df[c].values
            # The driver's hash is TYPE-sensitive: a DuckDB HUGEINT
            # (surfacing here as float64 or object) vs a Spark BIGINT
            # hashes differently even when every value is numerically
            # identical (r9 verdict: q179/q192). Mirror that strictness:
            # an int-vs-float dtype-kind mismatch is a FAIL even if the
            # values match — report it as TYPE-ONLY so it's attributable
            # (fix is a CAST in the oracle SQL, not in the engine).
            ka, kb = a.dtype.kind, b.dtype.kind
            int_kinds, flt_kinds = ('i', 'u'), ('f',)
            if (ka in int_kinds and kb in flt_kinds) or (ka in flt_kinds and kb in int_kinds):
                ok = False
                fa, fb = a.astype('float64'), b.astype('float64')
                vals_eq = bool((((pd.isna(fa)) & (pd.isna(fb))) | (fa == fb)).all())
                tag = "TYPE-ONLY mismatch (values identical)" if vals_eq else "type AND value mismatch"
                print(f"FAIL {name}: col {c} dtype spark={a.dtype} duck={b.dtype} — {tag};"
                      f" driver hash would red this — CAST the oracle SQL")
                break
            if ka in flt_kinds or kb in flt_kinds:
                eq = (pd.isna(a) & pd.isna(b)) | (a == b)
            else:
                eq = (pd.Series(a).astype(str).values == pd.Series(b).astype(str).values)
            if not eq.all():
                ok = False
                i = int(np.argmin(eq))
                print(f"FAIL {name}: col {c} differs at row {i}: spark={a[i]!r} duck={b[i]!r}"
                      f" (dtypes {a.dtype}/{b.dtype}, {int((~eq).sum())} diffs)")
                break
    if ok:
        print(f"ok   {name}: {len(spark_df)} rows")
    else:
        fails.append(name)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} match")
sys.exit(1 if fails else 0)
