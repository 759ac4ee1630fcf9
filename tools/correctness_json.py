#!/usr/bin/env python3
"""Emit a driver-format CORRECTNESS json from a graft.Verify dump.

Mirrors tools/check.py's compare (sort columns by name, normalize, cell
equality) but writes the per-query {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err} map the driver's harness produces, so a
locally regenerated artifact is field-compatible with the driver's.

Usage: correctness_json.py <sfdir> <verify-outdir> <out.json> [provenance]
"""
import sys, json, glob, os

import duckdb, numpy as np, pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(s):
    if s.dtype == object:
        return s.map(lambda x: tuple(x) if isinstance(x, (list, np.ndarray)) else x)
    return s


def cells_equal(a, b):
    a, b = norm(a), norm(b)
    try:
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            return np.allclose(a.values.astype(float), b.values.astype(float),
                               rtol=0, atol=0, equal_nan=True)
    except TypeError:
        pass
    return bool(((a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)).all())


def load_spark(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        raise FileNotFoundError(path)
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main():
    sfdir, outdir, dest = sys.argv[1], sys.argv[2], sys.argv[3]
    provenance = sys.argv[4] if len(sys.argv) > 4 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    dumped = sorted(d for d in os.listdir(outdir)
                    if os.path.isdir(os.path.join(outdir, d)))
    result = {}
    for name in dumped:
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sd = load_spark(f"{outdir}/{name}")
            entry["spark_rows"] = len(sd)
        except FileNotFoundError:
            entry["err"] = "no_spark_result"
            result[name] = entry
            continue
        if name not in oracle:
            entry["err"] = "no_oracle"
            result[name] = entry
            continue
        try:
            dd = con.execute(oracle[name]).df()
        except Exception as e:
            entry["err"] = f"duckdb: {e}"
            result[name] = entry
            continue
        entry["oracle_rows"] = len(dd)
        sd = sd[sorted(sd.columns)].reset_index(drop=True)
        dd = dd[sorted(dd.columns)].reset_index(drop=True)
        entry["rows_match"] = len(sd) == len(dd)
        entry["schema_match"] = list(sd.columns) == list(dd.columns)
        entry["hash_match"] = bool(
            entry["rows_match"] and entry["schema_match"] and
            all(cells_equal(sd[c], dd[c]) for c in sd.columns))
        result[name] = entry
    if provenance:
        result["__provenance"] = provenance
    json.dump(result, open(dest, "w"), indent=2)
    ok = sum(1 for k, v in result.items()
             if k != "__provenance" and v.get("hash_match"))
    print(f"{dest}: {len(dumped)} queries, {ok} hash-match")


main()
