#!/usr/bin/env python3
"""Per-query-JVM bench harness for the scale rehearsal's heavy subset.

Why: the r11 sf2 spot-check ran the heavy queries alphabetically in ONE
JVM, and the shared heap turned q_triangles' reading into a suite-context
artifact (e(1->2) = 1.83 in-suite vs 1.09 solo) that needed a prose
adjudication in SCALE_MEASURED.md. A fresh JVM per query removes the
shared-heap channel entirely, so exponents stand on their own.

Each query runs `graft.Bench <query>` in its own JVM (Bench itself does an
untimed warm-up pass then min-of-two timed passes, so every query gets the
identical in-JVM protocol). Results merge into ONE bench-JSON line with
the same shape the in-suite runs produce, consumable by
tools/scale_report.py.

Usage:
  python3 tools/bench_solo.py <sf_dir> <out.json> <q1,q2,...> [xmx]

Runs with CWD = repo root (resources resolved from the sbt classes dir;
compile first: `sbt compile`). Default JVM heap 32g - the sf2 parquet
read-ahead buffers OOM under 32 concurrent scans at the 8g default.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = os.path.join(REPO, "target", "scala-2.13", "classes")
RESOURCES = os.path.join(REPO, "src", "main", "resources")
SPARK_JARS = "/opt/spark/jars/*"


def run_one(sf_dir, query, xmx):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    cmd = [
        "java", f"-Xmx{xmx}",
        "--add-exports=java.base/sun.nio.ch=ALL-UNNAMED",
        "--add-opens=java.base/java.nio=ALL-UNNAMED",
        "--add-opens=java.base/java.util=ALL-UNNAMED",
        "--add-opens=java.base/java.lang=ALL-UNNAMED",
        "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
        "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
        "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
        "-cp", f"{CLASSES}:{RESOURCES}:{SPARK_JARS}",
        "graft.Bench", query,
    ]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise RuntimeError(
        f"{query}: no bench JSON (rc={out.returncode})\n"
        f"stderr tail: {out.stderr[-2000:]}")


def main():
    sf_dir, out_path, qlist = sys.argv[1], sys.argv[2], sys.argv[3]
    xmx = sys.argv[4] if len(sys.argv) > 4 else "32g"
    queries, errors = {}, {}
    for q in qlist.split(","):
        try:
            r = run_one(sf_dir, q, xmx)
            queries.update(r["queries"])
            errors.update(r.get("errors", {}))
            print(f"{q}: {r['queries'].get(q, float('nan')):.2f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            errors[q] = str(e)
            print(f"{q}: ERROR {e}", flush=True)
    merged = {
        "metric": "total", "value": sum(queries.values()), "unit": "sec",
        "n_errors": len(errors), "queries": queries, "errors": errors,
        "sf": sf_dir, "isolation": "one JVM per query (tools/bench_solo.py)",
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(merged) + "\n")
    print(f"wrote {out_path}: {len(queries)} queries, {len(errors)} errors")


if __name__ == "__main__":
    main()
