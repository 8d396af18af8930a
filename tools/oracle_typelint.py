#!/usr/bin/env python3
"""Authoring-time oracle type lint (no data read — DESCRIBE only).

Usage: python3 tools/oracle_typelint.py <sfDir> <oraclesJsonPath>

DESCRIBEs every oracle query in DuckDB over views of the testdata and
prints one line per OFFENDING column typed HUGEINT — the dtype DuckDB
gives a bare sum(BIGINT/INTEGER), which Spark can never produce, so the
driver's representation-sensitive hash diverges even when values match
(the f32/s27 class of round-9 red). The repo convention is
CAST(sum(...) AS BIGINT/DOUBLE); this lint makes the slip a test failure
at authoring time instead of a red CORRECTNESS row a round later.

Exit 0 with no output = clean. Exit 2 = offenders printed.
"""
import json
import sys
import glob
import os

import duckdb


def main():
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
        for cname, ctype, *_ in cols:
            if ctype.upper() in ("HUGEINT", "UHUGEINT"):
                print(f"{name}: column {cname} is {ctype} — wrap in "
                      f"CAST(... AS BIGINT) (driver hash diverges on "
                      f"representation)")
                bad += 1
    sys.exit(2 if bad else 0)


if __name__ == "__main__":
    main()
