#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with views over
<sfDir>/*.parquet, then compares: schema (column names), row count, and
values (columns sorted by name, rows sorted, floats rounded to 9
significant-ish decimals before hashing).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: datetimes → ISO strings (µs), floats stay float
    out = {}
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.datetime64):
            out[c] = s.dt.floor("us").dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            out[c] = s.map(lambda v: str(v) if v is not None else None)
        else:
            out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first").reset_index(drop=True)
    return df

def dtype_kind(s: pd.Series) -> str:
    if np.issubdtype(s.dtype, np.datetime64): return "datetime"
    if s.dtype == bool or str(s.dtype) == "boolean": return "bool"
    if np.issubdtype(s.dtype, np.integer): return "int"
    if np.issubdtype(s.dtype, np.floating): return "float"
    return "object"

def compare(name, spark_df, duck_df):
    problems = []
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        return [f"schema mismatch: spark={sc} duck={dc}"]
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount mismatch: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    # DTYPE-STRICT: the driver hashes values through their materialized
    # pandas dtype, so int64 vs float64 is a hash mismatch even when the
    # values are numerically equal (the r5 q101/q113 HUGEINT trap). Fail
    # loudly on any kind divergence instead of coercing it away.
    for c in sc:
        ks, kd = dtype_kind(spark_df[c]), dtype_kind(duck_df[c])
        if ks != kd:
            problems.append(
                f"dtype mismatch col {c}: spark={spark_df[c].dtype}({ks}) "
                f"duck={duck_df[c].dtype}({kd}) — driver hashes these differently")
    if problems:
        return problems
    a, b = canon(spark_df), canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            # EXACT: the driver's hash compare gives no float tolerance,
            # so neither do we. Rounded aggregates must be bit-identical.
            bad = ~((av == bv) | (av.isna() & bv.isna()))
            if bad.any():
                diffs = (av - bv).abs()
                print(f"   [maxdiff {name}.{c}: {diffs.max():.3e}]")
        else:
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        if bad.any():
            i = int(np.argmax(bad.values))
            problems.append(f"col {c}: {int(bad.sum())} diffs, first at row {i}: spark={a[c][i]!r} duck={b[c][i]!r}")
    return problems

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    dirs = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in dirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            status = "PASS(rows-only)" if len(spark_df) > 0 else "FAIL(rows-only, 0 rows)"
            if len(spark_df) > 0: n_pass += 1
            else: n_fail += 1
            print(f"{status} {name}: {len(spark_df)} rows, no oracle")
            continue
        try:
            rel = con.sql(oracle[name])
            duck_types = [str(t) for t in rel.types]
            duck_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        problems = []
        # registry invariant: no oracle may emit HUGEINT — duckdb-python
        # materializes it as float64 and the driver hashes it as float
        # while Spark emits int64 (the exact r5 q101/q113 failure)
        hug = [f"{col}:{t}" for col, t in zip(rel.columns, duck_types)
               if "HUGEINT" in t.upper()]
        if hug:
            problems.append(f"oracle emits HUGEINT ({', '.join(hug)}) — add CAST(... AS BIGINT)")
        problems += compare(name, spark_df, duck_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name}:")
            for p in problems: print(f"   {p}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(spark_df)} rows")
    missing = sorted(set(oracle) - set(dirs))
    for m in missing:
        print(f"FAIL {m}: oracle present but no spark output dir"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
