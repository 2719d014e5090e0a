"""Append a one-off probe block to BENCH_PROBES.json (append-only evidence).

r12 verdict evidence-hygiene item: one-off probes (calm isolation runs, scale
closures) used to be written into BENCH_DETAIL.json, which the next bench
sweep overwrites — the evidence survived only in git history. BENCH_PROBES
.json is the standing store: bench.py never touches it, and this script only
ever APPENDS.

Usage:
    python scripts/record_probe.py <name> '<json-or-text-payload>'
    echo '<json>' | python scripts/record_probe.py <name> -

The payload may be a JSON object (merged into the probe entry) or any string
(stored under "note"). Every entry is stamped with UTC time and loadavg.
"""

from __future__ import annotations

import json
import os
import sys
import time

PROBES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_PROBES.json")


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    name, raw = sys.argv[1], sys.argv[2]
    if raw == "-":
        raw = sys.stdin.read()
    try:
        payload = json.loads(raw)
        if not isinstance(payload, dict):
            payload = {"note": payload}
    except ValueError:
        payload = {"note": raw}

    entry = {"name": name, "recorded_utc": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())}
    try:
        entry["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    entry.update(payload)

    try:
        doc = json.load(open(PROBES))
    except (OSError, ValueError):
        doc = {"_doc": "Append-only one-off probe evidence; bench.py never writes this file.", "probes": []}
    doc["probes"].append(entry)
    # atomic replace: a crash mid-dump must not truncate the accumulated
    # evidence history (the one loss mode this file exists to prevent)
    tmp = PROBES + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1)
    os.replace(tmp, PROBES)
    print(f"recorded probe '{name}' ({len(doc['probes'])} total)")


if __name__ == "__main__":
    main()
