#!/usr/bin/env python3
"""Refresh src/main/resources/bench_baseline.json from full-suite bench runs.

Usage: python3 tools/refresh_ledger.py <note> <run1.json> [run2.json ...]

Each input is a file containing graft.Bench's JSON line (an sbt [info]
prefix is tolerated). The ledger records the PER-QUERY MIN across the
given runs (each run is itself a min of two same-JVM timed passes), the
same discipline the round-7 recording used. Refuses runs with errors.
"""
import json
import sys


MAX_LEDGER_DRIFT = 1.15


def load(path):
    s = open(path).read()
    d = json.loads(s[s.index('{'):])
    if d.get("errors"):
        raise SystemExit(f"{path} has erroring queries: {d['errors']}")
    if "sf0.1" not in d.get("sf", ""):
        raise SystemExit(f"{path} is not an sf0.1 run: {d.get('sf')}")
    # A loaded host inflates every timing; a ledger recorded from such a
    # run silently raises the baseline and hides real regressions behind
    # it (the round-7 incident). Refuse outright rather than warn.
    drift = d.get("host_drift")
    if drift is not None and drift > MAX_LEDGER_DRIFT:
        raise SystemExit(
            f"{path}: host_drift {drift} exceeds {MAX_LEDGER_DRIFT} — "
            "re-measure on a quiet host before refreshing the ledger")
    return d["queries"]


def main():
    note, paths = sys.argv[1], sys.argv[2:]
    runs = [load(p) for p in paths]
    names = set().union(*[set(r) for r in runs])
    merged = {q: min(r[q] for r in runs if q in r) for q in sorted(names)}
    out = {"queries": merged, "recorded": note, "sf": "/root/testdata/sf0.1"}
    dest = "src/main/resources/bench_baseline.json"
    json.dump(out, open(dest, "w"), indent=1)
    print(f"wrote {dest}: {len(merged)} queries, "
          f"total {sum(merged.values()):.1f}s, from {len(paths)} run(s)")


if __name__ == "__main__":
    main()
