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

def kind(s):
    """Type *kind* for the driver-faithful dtype compare: int/float/bool/
    datetime/object. The driver's hasher distinguishes value types, so a
    Spark BIGINT vs a DuckDB HUGEINT (pandas float64/object) must FAIL
    locally too — that exact blindness shipped 7 red rows in round 10."""
    if np.issubdtype(s.dtype, np.datetime64): return "datetime"
    if np.issubdtype(s.dtype, np.bool_): return "bool"
    if np.issubdtype(s.dtype, np.integer): return "int"
    if np.issubdtype(s.dtype, np.floating): return "float"
    return "object"

def cells_equal(a, b):
    a, b = norm(a), norm(b)
    if kind(a) != kind(b):
        return False  # dtype-kind mismatch = driver hash mismatch
    if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
        av, bv = a.astype(float).values, b.astype(float).values
        return np.array_equal(av, bv, equal_nan=True)
    try:
        eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
        return bool(np.all(eq))
    except Exception:
        return list(a.values) == list(b.values)

BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT")
# Widest DECIMAL precision the cross-engine compare is safe at. DuckDB
# promotes decimal arithmetic freely up to DECIMAL(38,_); Spark caps at
# 38 too but the two engines' promotion rules differ, and a >18-digit
# decimal no longer round-trips exactly through int64/float64 — the same
# class of silent divergence HUGEINT caused in r10. Oracles must CAST
# sums back down (the house D.dec/oSumDec10 helpers stay within this).
MAX_DECIMAL_PRECISION = 18

def _decimal_too_wide(t):
    m = __import__("re").match(r"DECIMAL\((\d+)\s*,\s*\d+\)", str(t).upper())
    return bool(m) and int(m.group(1)) > MAX_DECIMAL_PRECISION

def audit_types(con, oracle):
    """Plan (not run) every oracle in DuckDB and flag any output column
    whose type the driver would hash differently from Spark's physical
    type — HUGEINT/UHUGEINT (int128, from an uncast integer SUM) have no
    Spark equivalent and always hash-diverge, and DECIMALs wider than
    MAX_DECIMAL_PRECISION digits exceed what the hasher normalizes
    exactly (the next HUGEINT-class candidate)."""
    bad = []
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
            hits = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                    if str(t).upper() in BANNED_DUCK_TYPES
                    or _decimal_too_wide(t)]
        except Exception as e:
            print(f"TYPEAUDIT ERR {name}: {e}")
            bad.append(name); continue
        if hits:
            print(f"TYPEAUDIT FAIL {name}: {hits} — wrap in CAST(... AS "
                  f"BIGINT) or a <= {MAX_DECIMAL_PRECISION}-digit DECIMAL")
            bad.append(name)
    return bad

def audit_selftest():
    """`check.py --audit-selftest`: the audit must FAIL on seeded bad
    oracles (a HUGEINT sum, a wide DECIMAL) and PASS a clean one —
    guards the guard (judge r11 item 8)."""
    con = duckdb.connect()
    seeded = {
        "seeded_hugeint": "SELECT SUM(x) AS s FROM (SELECT 1::BIGINT AS x)",
        "seeded_wide_decimal": "SELECT CAST(1.5 AS DECIMAL(38,10)) AS v",
        "seeded_clean": "SELECT CAST(1 AS BIGINT) AS n, "
                        "CAST(1.5 AS DECIMAL(18,4)) AS d",
    }
    bad = audit_types(con, seeded)
    assert "seeded_hugeint" in bad, "audit missed a HUGEINT output"
    assert "seeded_wide_decimal" in bad, "audit missed a wide DECIMAL"
    assert "seeded_clean" not in bad, "audit flagged a clean oracle"
    print("audit selftest: ok (2 seeded offenders flagged, clean passed)")
    sys.exit(0)

def main():
    if sys.argv[1:] == ["--audit-selftest"]:
        audit_selftest()
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    type_bad = audit_types(con, {n: s for n, s in oracle.items()
                                 if not only or n in only})
    fails, okc = list(type_bad), 0
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
    fails = sorted(set(fails))
    print(f"\n{okc} ok, {len(fails)} failed" + (f": {fails}" if fails else ""))
    sys.exit(1 if fails else 0)

main()
