#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify at a given SF dir, then executes each oracle SQL in DuckDB
over the same parquet tables and compares: schema (column names), row count,
and a hash of all values with columns sorted by name and rows sorted.

Usage: python3 tools/check_oracle.py [sfdir] [outdir] [q1,q2,...]

An optional third argument (comma-separated query names) runs and
compares ONLY that subset — the fast loop while iterating on one entry;
omit it for the full gate.
"""
import json
import math
import os
import shutil
import subprocess
import sys
import tempfile

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = sys.argv[3] if len(sys.argv) > 3 else None
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# JVM flags mirroring build.sbt's forked-run options (Spark 4 on JDK 17).
ADD_OPENS_PKGS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def run_verify_from_snapshot():
    """Compile via sbt, then run graft.Verify from a SNAPSHOT of the
    compiled classes with plain `java`. The snapshot is what kills the
    classfile race (r5 verdict "What's wrong" #1): the Verify JVM
    lazy-loads query classes over its whole run, and a CONCURRENT sbt
    compile swapping target/'s classfiles under it corrupts the run —
    seen as a spurious hash mismatch in the r5 driver gate. With the
    copy, a compile during the gate touches target/, not the classpath
    the running JVM reads.
    """
    print(f"running Verify on {SF} -> {OUT}", flush=True)
    # Compile/copyResources too (ADVICE r6): `compile` alone does not copy
    # src/main/resources into target/classes, and the DataSourceRegister
    # service file lives there — on a clean target the snapshot would lack
    # it and every graft-status/graft-sharded query dies with
    # DATA_SOURCE_NOT_FOUND.
    c = subprocess.run(["sbt", "-batch", "Compile/copyResources", "compile"],
                       capture_output=True, text=True, cwd="/root/repo")
    if c.returncode != 0:
        print(c.stdout[-4000:])
        print(c.stderr[-4000:])
        sys.exit(1)
    snap = tempfile.mkdtemp(prefix="graft-gate-classes-")
    shutil.copytree("/root/repo/target/scala-2.13/classes", snap,
                    dirs_exist_ok=True)
    # belt-and-braces: resources straight from src, in case a future sbt
    # stops materializing them under target/classes
    res = "/root/repo/src/main/resources"
    if os.path.isdir(res):
        shutil.copytree(res, snap, dirs_exist_ok=True)
    cmd = ["java"]
    for p in ADD_OPENS_PKGS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += [
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        # same env override build.sbt's javaOptions honors
        f"-Xmx{os.environ.get('SPARK_DRIVER_MEM', '32g')}",
        "-cp", f"{snap}:/opt/spark/jars/*",
        "graft.Verify", SF, OUT,
    ] + ([ONLY] if ONLY else [])
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    shutil.rmtree(snap, ignore_errors=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)


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
    run_verify_from_snapshot()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    if ONLY:
        wanted = set(ONLY.split(","))
        oracles = {k: v for k, v in oracles.items() if k in wanted}
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
