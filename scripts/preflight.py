"""End-of-round preflight gate (round-8 verdict task 4): never ship red.

Runs, in order:
  1. ``pytest tests/ -x -q``           — the full suite, fail-fast
  2. ``oracle_check.py <sf> --head``   — the driver's 50-query gate window

Exit code is nonzero if either fails. Run this BEFORE the end-of-round
snapshot commit; if a late-added test fails and cannot be fixed in-round,
mark it xfail with a tracking note instead of committing a red suite.

Usage: python scripts/preflight.py [sf_dir]   (default /root/testdata/sf0.01)
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
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    py = sys.executable
    ok = run("pytest", [py, "-m", "pytest", "tests/", "-x", "-q"])
    ok = run("oracle head-50", [py, "scripts/oracle_check.py", sf, "--head"]) and ok
    print(f"== preflight: {'GREEN' if ok else 'RED'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
