#!/usr/bin/env python3
"""Replica of the driver's bounded-tail read of the bench stdout.

The driver captures `sbt "runMain graft.Bench"` stdout, keeps a bounded
tail (~2000 chars), and tries to JSON-parse the bench's compact one-line
result out of it. Every BENCH_r*.json since r08 has `parsed: null`
because the line arrived wrapped by sbt ("[info] {...}") with a
"[success] Total time" trailer after it. build.sbt now passes forked run
output through verbatim (StdoutOutput) and suppresses the trailer
(showSuccess := false); this script verifies the fix against BOTH parser
models a reasonable driver could use:

  A. parse the LAST non-empty line of the tail
  B. scan lines from the end, take the first that json-parses

Usage:
  python3 tools/tail_parse.py <logfile>     # verify a captured stdout log
  python3 tools/tail_parse.py --run [sfdir] # run the bench, then verify

Exits 0 only if BOTH strategies recover a dict with "metric" and
"queries" keys from the 2000-char tail.
"""
import json, os, subprocess, sys

TAIL = 2000


def last_line_parse(tail: str):
    lines = [l for l in tail.splitlines() if l.strip()]
    if not lines:
        return None
    try:
        return json.loads(lines[-1])
    except Exception:
        return None


def reverse_scan_parse(tail: str):
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            return json.loads(line)
        except Exception:
            continue
    return None


def verify(stdout: str) -> int:
    tail = stdout[-TAIL:]
    ok = True
    for name, fn in (("A last-line", last_line_parse),
                     ("B reverse-scan", reverse_scan_parse)):
        parsed = fn(tail)
        good = isinstance(parsed, dict) and "metric" in parsed and "queries" in parsed
        print(f"strategy {name}: {'OK' if good else 'FAIL'}"
              + (f" total={parsed.get('value')} nqueries={len(parsed.get('queries', {}))}"
                 if good else f" got={parsed!r}" if parsed is not None else ""))
        ok &= good
    if not ok:
        print("--- tail ---")
        print(tail)
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_SF_DIR", sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
        env.setdefault("SPARK_GRAFT_CPUS", "8")
        env.setdefault("SPARK_GRAFT_BENCH_REPS", "1")
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                           cwd="/root/repo", env=env, capture_output=True,
                           text=True, timeout=3600)
        print(f"rc={r.returncode}")
        sys.exit(verify(r.stdout))
    elif len(sys.argv) > 1:
        sys.exit(verify(open(sys.argv[1]).read()))
    else:
        print(__doc__)
        sys.exit(2)
