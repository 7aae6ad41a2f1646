#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify at a given SF dir, then executes each oracle SQL in DuckDB
over the same parquet tables and compares: schema (column names), row count,
and a hash of all values with columns sorted by name and rows sorted.

Usage: python3 tools/check_oracle.py [sfdir] [outdir]
"""
import json
import math
import subprocess
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return out


def main():
    print(f"running Verify on {SF} -> {OUT}", flush=True)
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo")
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
            spark_cols = [c for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            ora_rel = con.sql(sql)
            ora_cols = [c for c in ora_rel.columns]
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(ora_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} oracle={sorted(ora_cols)}")
            n_fail += 1
            continue
        if len(spark_rows) != len(ora_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} oracle={len(ora_rows)}")
            n_fail += 1
            continue
        a, b = canon(spark_rows, spark_cols), canon(ora_rows, ora_cols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracles)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
