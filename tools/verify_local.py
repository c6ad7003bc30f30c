#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<query>/ parquet dirs and <outDir>/oracle_sql.json. Registers each
testdata parquet as a DuckDB view, runs the oracle SQL, and compares to the
Spark dump: row count, sorted-by-name columns, and exact per-cell equality.
"""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for q, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{q}"
    if not os.path.isdir(spark_path):
        fails.append((q, "no spark output")); continue
    try:
        # HUGEINT gate: DuckDB SUM(BIGINT) yields int128, which some
        # DuckDB/pandas client versions render as float ("476.0") — that
        # passes this value compare but fails the driver's stringify-then-
        # hash compare (the root cause of the six r12 hash-only reds).
        # Any oracle emitting HUGEINT is therefore a failure HERE, before
        # the driver ever sees it.
        rel = con.sql(sql)
        hug = [c for c, t in zip(rel.columns, rel.types)
               if str(t) in ("HUGEINT", "UHUGEINT")]
        if hug:
            fails.append((q, f"HUGEINT output columns {hug}: cast to BIGINT")); continue
        odf = con.execute(sql).df()
    except Exception as e:
        fails.append((q, f"oracle error: {e}")); continue
    sdf = con.execute(f"SELECT * FROM '{spark_path}/*.parquet'").df()
    if list(sorted(odf.columns)) != list(sorted(sdf.columns)):
        fails.append((q, f"cols oracle={sorted(odf.columns)} spark={sorted(sdf.columns)}")); continue
    odf = odf[sorted(odf.columns)]
    sdf = sdf[sorted(sdf.columns)]
    if len(odf) != len(sdf):
        fails.append((q, f"rows oracle={len(odf)} spark={len(sdf)}")); continue
    mismatch = None
    for c in odf.columns:
        a, b = odf[c].tolist(), sdf[c].tolist()
        import math
        for i, (x, y) in enumerate(zip(a, b)):
            if hasattr(x, "__len__") and not isinstance(x, str):
                eq = list(x) == list(y)
            elif isinstance(x, float) and isinstance(y, float):
                eq = x == y or (math.isnan(x) and math.isnan(y))
            else:
                eq = (x == y) or (x is None and y is None)
            if not eq:
                mismatch = f"col {c} row {i}: oracle={x!r} spark={y!r}"
                break
        if mismatch: break
    if mismatch: fails.append((q, mismatch))
    else: passes.append(q)

print(f"PASS {len(passes)}/{len(oracle)}: {' '.join(passes)}")
for q, why in fails:
    print(f"FAIL {q}: {why}")
sys.exit(1 if fails else 0)
