#!/usr/bin/env python3
"""DuckDB side of the qtest conformance sweep (QtestConformanceSpec).

stdin: JSON {"tables": {name: parquetDir}, "queries": {name: sql}}
stdout: JSON {name: [[cell, ...], ...]} — cells stringified, NULL -> "NULL";
        a failed query maps to {"error": "..."} so the Scala side can show
        which statement the oracle rejected.
"""
import json
import sys

import duckdb


def main():
    spec = json.load(sys.stdin)
    con = duckdb.connect()
    for name, path in spec["tables"].items():
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/*.parquet')"
            % (name, path))
    out = {}
    for name, q in spec["queries"].items():
        try:
            rows = con.execute(q).fetchall()
            out[name] = [["NULL" if v is None else str(v) for v in row]
                         for row in rows]
        except Exception as e:  # surface per-query, keep the batch going
            out[name] = {"error": str(e)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
