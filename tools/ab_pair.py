#!/usr/bin/env python3
"""Paired adjacent-run A/B bench for optimization adjudication.

The r14 lesson: this sandbox's host drift is heterogeneous (0.84x-5x per
query) and time-varying, so single before/after readings are meaningless.
The protocol that survived r14's verdict audit is the paired adjacent-run
A/B: alternate BEFORE and AFTER class snapshots in back-to-back JVMs so
both sides of every pair see (nearly) the same host window, then judge by
the per-pair ratio vector and its median, never by one reading.

Usage:
  python3 tools/ab_pair.py --a <classesA> --b <classesB> \
      --q q1[,q2...] --pairs 3 [--sf /root/testdata/sf0.1] [--xmx 8g]

A = before snapshot, B = after snapshot (each a compiled classes dir,
e.g. cp -r target/scala-2.13/classes /tmp/classes_before). Each run is
`graft.Bench <queries>` in its own JVM (untimed warm-up + min-of-two, the
identical in-JVM protocol the suite uses). Pair order alternates
(A,B / B,A / A,B ...) so a monotone host trend cannot masquerade as a win.
Prints per-pair B/A ratios per query and the median ratio.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESOURCES = os.path.join(REPO, "src", "main", "resources")
SPARK_JARS = "/opt/spark/jars/*"

JVM_FLAGS = [
    "--add-exports=java.base/sun.nio.ch=ALL-UNNAMED",
    "--add-opens=java.base/java.nio=ALL-UNNAMED",
    "--add-opens=java.base/java.util=ALL-UNNAMED",
    "--add-opens=java.base/java.lang=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
    "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
    "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
]


def run_once(classes, queries, sf_dir, xmx):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    cmd = (["java", f"-Xmx{xmx}"] + JVM_FLAGS +
           ["-cp", f"{classes}:{RESOURCES}:{SPARK_JARS}",
            "graft.Bench", queries])
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         cwd=REPO)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)["queries"]
    raise RuntimeError(f"no bench JSON (rc={out.returncode})\n"
                       f"stderr tail: {out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="BEFORE classes dir")
    ap.add_argument("--b", required=True, help="AFTER classes dir")
    ap.add_argument("--q", required=True, help="comma-separated queries")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--xmx", default=os.environ.get("SPARK_DRIVER_MEM", "8g"))
    args = ap.parse_args()

    names = args.q.split(",")
    ratios = {q: [] for q in names}
    times = {q: {"a": [], "b": []} for q in names}
    for p in range(args.pairs):
        order = [("a", args.a), ("b", args.b)]
        if p % 2 == 1:
            order.reverse()
        got = {}
        for tag, classes in order:
            got[tag] = run_once(classes, args.q, args.sf, args.xmx)
        for q in names:
            ta, tb = got["a"].get(q), got["b"].get(q)
            if ta is None or tb is None:
                print(f"pair {p}: {q} missing (a={ta}, b={tb})")
                continue
            times[q]["a"].append(ta)
            times[q]["b"].append(tb)
            ratios[q].append(tb / ta)
            print(f"pair {p} [{'-'.join(t for t, _ in order)}] {q}: "
                  f"A={ta:.3f}s B={tb:.3f}s  B/A={tb / ta:.3f}", flush=True)
    print("\n== medians (B/A < 1 means AFTER is faster) ==")
    for q in names:
        if ratios[q]:
            med = statistics.median(ratios[q])
            mina = min(times[q]["a"])
            minb = min(times[q]["b"])
            print(f"{q}: median_ratio={med:.3f} "
                  f"ratios={[round(r, 3) for r in ratios[q]]} "
                  f"minA={mina:.3f}s minB={minb:.3f}s min_ratio={minb/mina:.3f}")


if __name__ == "__main__":
    sys.exit(main())
