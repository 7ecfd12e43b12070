#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then run each oracle SQL in DuckDB over the same parquet tables
and compare row-by-row (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [query...]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("-") else "/tmp/verify_out"
SKIP = "--skip-verify" in sys.argv
ONLY = [a for a in sys.argv[3:] if not a.startswith("-")]

if not SKIP:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
            elif isinstance(v, (list, tuple)):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [cols[i] for i in order]

passed = failed = nocheck = 0
for name in sorted(oracle):
    if ONLY and name not in ONLY: continue
    pq = Path(OUT) / name
    if not pq.exists():
        print(f"FAIL  {name}: spark output missing"); failed += 1; continue
    try:
        s_rel = con.sql(f"SELECT * FROM '{pq}/*.parquet'")
        s_rows, s_cols = canon(s_rel.fetchall(), [d[0] for d in s_rel.description])
        d_rel = con.sql(oracle[name])
        d_rows, d_cols = canon(d_rel.fetchall(), [d[0] for d in d_rel.description])
    except Exception as e:
        print(f"FAIL  {name}: {str(e)[:200]}"); failed += 1; continue
    if s_cols != d_cols:
        print(f"FAIL  {name}: columns {s_cols} != {d_cols}"); failed += 1; continue
    if len(s_rows) != len(d_rows):
        print(f"FAIL  {name}: rows {len(s_rows)} != {len(d_rows)}"); failed += 1; continue
    bad = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    if bad:
        print(f"FAIL  {name}: {len(bad)}/{len(s_rows)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
        failed += 1
    else:
        print(f"ok    {name} ({len(s_rows)} rows)"); passed += 1

# queries without oracle: rows-only check
for pq in sorted(Path(OUT).iterdir()):
    if pq.is_dir() and pq.name not in oracle and (not ONLY or pq.name in ONLY):
        try:
            n = con.sql(f"SELECT count(*) FROM '{pq}/*.parquet'").fetchone()[0]
            print(f"rows  {pq.name}: {n} rows (no oracle)")
            nocheck += 1
        except Exception as e:
            print(f"FAIL  {pq.name}: unreadable {str(e)[:100]}"); failed += 1

print(f"\n{passed} ok, {failed} FAIL, {nocheck} rows-only")
sys.exit(1 if failed else 0)
