"""End-of-round preflight gate (round-8 verdict task 4): never ship red.

Runs, in order:
  1. ``pytest tests/ -x -q``           — the full suite, fail-fast
  2. ``oracle_check.py <sf> --head``   — the driver's 50-query gate window
  3. (with ``--dbgen``) ``oracle_check.py <dbgen sf1 dir> tpch_`` — the
     22-query TPC-H family against REAL DuckDB-dbgen data (r10 verdict
     task 6: predicate regressions on real distributions — word-salad
     p_type, returns-era date windows, SF-sensitive thresholds — must not
     ship silently on synthetic-only evidence). Generates/reuses the cached
     sf1 parquet via sources/tpch_dbgen.tpch_dir().

Exit code is nonzero if any stage fails. Run this BEFORE the end-of-round
snapshot commit; if a late-added test fails and cannot be fixed in-round,
mark it xfail with a tracking note instead of committing a red suite.

Usage: python scripts/preflight.py [sf_dir] [--dbgen]
       (default sf_dir /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> bool:
    print(f"== preflight: {label}: {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    rc = subprocess.call(cmd, cwd=REPO)
    print(f"== preflight: {label}: rc={rc} ({time.perf_counter() - t0:.0f}s)", flush=True)
    return rc == 0


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--dbgen"]
    dbgen = "--dbgen" in sys.argv[1:]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    py = sys.executable
    ok = run("pytest", [py, "-m", "pytest", "tests/", "-x", "-q"])
    ok = run("oracle head-50", [py, "scripts/oracle_check.py", sf, "--head"]) and ok
    if dbgen:
        sys.path.insert(0, REPO)
        from flink_1_6_0_spark.sources.tpch_dbgen import tpch_dir

        ok = run(
            "dbgen sf1 tpch gate",
            [py, "scripts/oracle_check.py", tpch_dir(1.0), "tpch_", "--nonempty"],
        ) and ok
    print(f"== preflight: {'GREEN' if ok else 'RED'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
