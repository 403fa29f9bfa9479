#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify via sbt,
then run each oracle SQL in DuckDB over the same parquet tables and compare
row counts, sorted columns, and values. Usage:
    python3 tools/local_verify.py [sfdir] [--skip-spark]
"""
import json, subprocess, sys, glob, os

sfdir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
# --only=q_a,q_b: targeted subset (rides to Verify via SPARK_GRAFT_VERIFY_ONLY
# and filters the oracle compare loop) -- used by the sf1 ladder sweep, where
# a full 160+-query pass at 10x data would take hours for a 10-query question
only = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        only = set(x.strip() for x in a[len("--only="):].split(",") if x.strip())
# sf-suffixed so concurrent runs at different scales never clobber each
# other's outputs mid-compare (bit round 6: an sf0.001 run overwrote a
# running sf0.1 sweep's parquet dumps)
outdir = "/tmp/graft_verify_" + os.path.basename(sfdir.rstrip("/"))

if "--skip-spark" not in sys.argv:
    env = dict(os.environ)
    if only:
        env["SPARK_GRAFT_VERIFY_ONLY"] = ",".join(sorted(only))
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    tail = (r.stdout + r.stderr)[-3000:]
    if r.returncode != 0:
        print(tail)
        sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

import duckdb
import pandas as pd

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # spark-written tables are DIRECTORIES of part files (the soak corpora);
    # driver testdata tables are single files -- support both
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = 0
for q, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{outdir}/{q}/*.parquet")
    if not spark_files:
        print(f"FAIL {q}: no spark output")
        fails += 1
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
    try:
        ddf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {q}: oracle error {e}")
        fails += 1
        continue
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        print(f"FAIL {q}: columns spark={scols} duck={dcols}")
        fails += 1
        continue
    if len(sdf) != len(ddf):
        print(f"FAIL {q}: rows spark={len(sdf)} duck={len(ddf)}")
        fails += 1
        continue
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    d = ddf[dcols].sort_values(dcols).reset_index(drop=True)
    mismatch = None
    for c in scols:
        sv, dv = s[c], d[c]
        # Mirror the driver's gate exactly: stringify both sides and compare.
        # No numeric tolerance — an int64 14623 vs a HUGEINT-cast float64
        # 14623.0 must FAIL here just as it fails the driver's hash compare.
        bad = sv.astype(str) != dv.astype(str)
        if bad.any():
            i = bad.idxmax()
            hint = "" if sv.dtype == dv.dtype else f" [dtype spark={sv.dtype} duck={dv.dtype}]"
            mismatch = f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r} ({int(bad.sum())} bad){hint}"
            break
    if mismatch:
        print(f"FAIL {q}: {mismatch}")
        fails += 1
    else:
        print(f"PASS {q}: {len(sdf)} rows, {len(scols)} cols exact")
print(f"{len(oracle) - fails}/{len(oracle)} queries pass")
sys.exit(1 if fails else 0)
