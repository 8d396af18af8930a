#!/usr/bin/env python3
"""Authoring-time oracle type lint (no data read — DESCRIBE only).

Usage: python3 tools/oracle_typelint.py <sfDir> <oraclesJsonPath>

DESCRIBEs every oracle query in DuckDB over views of the testdata and
prints one line per OFFENDING column in a dtype class the driver's
representation-sensitive hash is known to diverge on even when values
match cell-for-cell:

  * HUGEINT — the dtype DuckDB gives a bare sum(BIGINT/INTEGER), which
    Spark can never produce (the f32/s27 class of round-9 red). Fix:
    CAST(sum(...) AS BIGINT/DOUBLE).
  * DECIMAL(p, s), any width — round-16's q56 red was int128-backed
    DECIMAL(38,2); round-17 respelled it int64-backed DECIMAL(18,2) and
    the driver's hash STILL diverged while every cell matched, and q56
    was the catalog's only decimal output column. Fix: compute exactly
    in decimal, CAST(... AS DOUBLE) on BOTH legs.

This makes the slip a test failure at authoring time instead of a red
CORRECTNESS row a round later.

Exit 0 with no output = clean. Exit 2 = offenders printed.

Self-test: --selftest runs seeded wide-decimal/HUGEINT examples and
asserts they are flagged.
"""
import json
import sys
import glob
import os

import duckdb


def offenses(cols):
    """One (colname, dtype, advice) per column in a hash-divergent class."""
    out = []
    for cname, ctype, *_ in cols:
        t = ctype.upper()
        if t in ("HUGEINT", "UHUGEINT"):
            out.append((cname, ctype, "wrap in CAST(... AS BIGINT)"))
        elif t.startswith("DECIMAL"):
            # ANY decimal output hash-diverges in the driver (r16 red was
            # DECIMAL(38,2); the r17 respell to int64-backed DECIMAL(18,2)
            # still hash-failed as the catalog's only decimal output) —
            # compute in decimal, emit DOUBLE on BOTH legs.
            out.append((cname, ctype,
                        "decimal output — CAST(... AS DOUBLE) on BOTH legs"))
    return out


def selftest():
    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT 1::BIGINT AS a, "
                "CAST(1.23 AS DECIMAL(18,2)) AS d")
    seeded = {
        "hugeint": "SELECT sum(a) AS s FROM t",                  # HUGEINT
        "wide_decimal": "SELECT sum(d) AS s FROM t",             # DECIMAL(38,2)
        "clean": "SELECT CAST(sum(a) AS BIGINT) AS s, "
                 "CAST(sum(d) AS DOUBLE) AS sd FROM t",
    }
    got = {n: offenses(con.execute(f"DESCRIBE ({q})").fetchall())
           for n, q in seeded.items()}
    assert got["hugeint"], "seeded HUGEINT example not flagged"
    assert got["wide_decimal"], "seeded DECIMAL(38,2) example not flagged"
    assert got["wide_decimal"][0][1].upper().startswith("DECIMAL(38"), got
    narrow = offenses(con.execute(
        "DESCRIBE (SELECT CAST(sum(d) AS DECIMAL(18,2)) AS sd FROM t)"
    ).fetchall())
    assert narrow, "seeded DECIMAL(18,2) example not flagged (r17 q56 class)"
    assert not got["clean"], f"clean example falsely flagged: {got['clean']}"
    print("selftest OK: HUGEINT + DECIMAL(38,2) + DECIMAL(18,2) flagged, "
          "clean passes")


def main():
    if sys.argv[1] == "--selftest":
        selftest()
        return
    sf_dir, oracles_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(oracles_path) as f:
        oracles = json.load(f)
    bad = 0
    for name in sorted(oracles):
        try:
            cols = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
        except Exception as e:
            print(f"{name}: oracle does not plan: {str(e)[:160]}")
            bad += 1
            continue
        for cname, ctype, advice in offenses(cols):
            print(f"{name}: column {cname} is {ctype} — {advice} "
                  f"(driver hash diverges on representation)")
            bad += 1
    sys.exit(2 if bad else 0)


if __name__ == "__main__":
    main()
