#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (dev tool only; the
shipped engine has no Python). Usage: check.py <sfDir> <outDir> [name...]

Reads each <outDir>/<name> parquet (Verify.scala output) and the dumped
oracle_sql.json, runs the SQL in DuckDB over the same fixture parquet, and
compares: column names (sorted), row count, and exact cell values in result
order (rows order-sensitive, columns compared by sorted name — per the
driver contract)."""
import sys, json, glob
import duckdb, pandas as pd, numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(res_dir):
    parts = sorted(glob.glob(res_dir + "/*.parquet"))
    if not parts:
        raise FileNotFoundError(res_dir)
    return pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)

def norm(s):
    if np.issubdtype(s.dtype, np.datetime64):
        return s.astype("datetime64[ns]")
    if s.dtype == object:
        return s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return s

def cells_equal(a, b):
    a, b = norm(a), norm(b)
    if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
        av, bv = a.astype(float).values, b.astype(float).values
        return np.array_equal(av, bv, equal_nan=True)
    try:
        eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
        return bool(np.all(eq))
    except Exception:
        return list(a.values) == list(b.values)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails, okc = [], 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            sd = load_spark(f"{outdir}/{name}")
        except FileNotFoundError:
            print(f"FAIL {name}: no spark result dumped"); fails.append(name); continue
        try:
            dd = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); fails.append(name); continue
        sd = sd[sorted(sd.columns)].reset_index(drop=True)
        dd = dd[sorted(dd.columns)].reset_index(drop=True)
        if list(sd.columns) != list(dd.columns):
            print(f"FAIL {name}: cols spark={list(sd.columns)} duck={list(dd.columns)}")
            fails.append(name); continue
        if len(sd) != len(dd):
            print(f"FAIL {name}: rows spark={len(sd)} duck={len(dd)}")
            fails.append(name); continue
        bad = [c for c in sd.columns if not cells_equal(sd[c], dd[c])]
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}")
            for c in bad[:2]:
                a, b = norm(sd[c]), norm(dd[c])
                try:
                    if np.issubdtype(a.dtype, np.floating):
                        d = np.where(~np.isclose(a.values.astype(float), b.values.astype(float), equal_nan=True))[0]
                    else:
                        d = np.where(~((a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)))[0]
                    i = int(d[0]) if len(d) else 0
                except Exception:
                    i = 0
                print(f"  {c}[{i}]: spark={sd[c].iloc[i]!r} duck={dd[c].iloc[i]!r}")
            fails.append(name); continue
        okc += 1
        print(f"OK   {name} ({len(sd)} rows)")
    print(f"\n{okc} ok, {len(fails)} failed" + (f": {fails}" if fails else ""))
    sys.exit(1 if fails else 0)

main()
