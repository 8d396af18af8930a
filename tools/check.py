#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB-oracle comparison.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
corresponding oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
testdata, and compares cell-by-cell (exact for non-floats, 1e-9 rel tol for
floats). Reports rows-only queries separately.
"""
import json
import math
import sys
import glob
import os

import duckdb


# Normalized dtype classes for Spark-result vs DuckDB-oracle parity. The
# driver hashes values AFTER a round-trip that preserves dtype class, so a
# value-equal result can still hash-FAIL on representation: DuckDB types a
# bare sum(BIGINT) as HUGEINT which round-trips as float64 while Spark emits
# int64 (the f32/s27 class of round-9 red). Width differences inside a class
# (INT vs BIGINT, FLOAT vs DOUBLE) round-trip identically and are NOT
# flagged; HUGEINT is its own class, so it can never match a Spark output.
def dtype_class(t):
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith(("STRUCT", "MAP")) or t.endswith("[]"):
        return "nested"
    return {
        "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
        "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
        "UBIGINT": "int", "HUGEINT": "hugeint", "UHUGEINT": "hugeint",
        # JSON is DuckDB's logical alias of VARCHAR — round-trips as str
        "FLOAT": "float", "DOUBLE": "float", "VARCHAR": "str", "JSON": "str",
        "BLOB": "bytes",
        "BOOLEAN": "bool", "DATE": "date", "INTERVAL": "interval",
    }.get(t, t)


def dtypes_of(con, query):
    rows = con.execute(f"DESCRIBE {query}").fetchall()
    return {r[0]: r[1] for r in rows}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    result_dirs = [d for d in sorted(os.listdir(out_dir))
                   if os.path.isdir(f"{out_dir}/{d}")]
    n_pass = n_fail = n_rows_only = 0
    for name in result_dirs:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracles:
            status = "ROWS" if len(got) > 0 else "FAIL(empty)"
            if len(got) > 0:
                n_rows_only += 1
            else:
                n_fail += 1
            print(f"{status} {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        gidx = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        eidx = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        # dtype parity per column (the driver's hash is representation-
        # sensitive; python == is not — without this, int64 vs HUGEINT
        # passes here and fails the driver)
        try:
            gt = dtypes_of(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            et = dtypes_of(con, f"({oracles[name]})")
            mism = [(c, gt[c], et[c]) for c in gt
                    if c in et and dtype_class(gt[c]) != dtype_class(et[c])]
        except Exception as e:
            mism = []
            print(f"WARN {name}: dtype check skipped: {str(e)[:120]}")
        if mism:
            c, g, e = mism[0]
            print(f"FAIL {name}: dtype col {c}: spark {g} vs oracle {e} "
                  f"(oracle needs a CAST — driver hash will diverge)")
            n_fail += 1
            continue
        # DECIMAL output columns hash-diverge in the driver's round-trip
        # even when BOTH sides agree on the exact type and every cell
        # matches: round-16's q56 red was DECIMAL(38,2) (int128), and the
        # round-17 respell to int64-backed DECIMAL(18,2) STILL hash-failed
        # while being the only decimal output in the 211-query catalog —
        # so flag ANY decimal output on either side. Compute exactly in
        # decimal, then CAST the output to DOUBLE on both legs (the
        # pattern every hash-passing money query uses).
        wide = [(c, t, side) for side, ts in (("spark", gt), ("oracle", et))
                for c, t in ts.items() if t.upper().startswith("DECIMAL")]
        if wide:
            c, t, side = wide[0]
            print(f"FAIL {name}: {side} col {c} is {t} — decimal outputs "
                  f"hash-diverge in the driver (r16+r17 q56); CAST both "
                  f"legs' output to DOUBLE")
            n_fail += 1
            continue
        bad = None
        for r, (g, e) in enumerate(zip(got, exp)):
            for gi, ei in zip(gidx, eidx):
                a, b = g[gi], e[ei]
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if not (a == b or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)):
                        bad = (r, got_cols[gi], a, b)
                        break
                elif a != b:
                    bad = (r, got_cols[gi], a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: got {bad[2]!r} exp {bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
    missing = set(oracles) - set(result_dirs)
    for m in sorted(missing):
        print(f"FAIL {m}: oracle declared but no result dir")
        n_fail += 1
    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
