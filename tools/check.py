#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads <out>/oracle_sql.json, runs each SQL in DuckDB with views over the
sf parquet tables, reads the Spark result parquet from <out>/<name>/, and
compares: schema (column names sorted), row count, and values in row order.
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)

def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. ScaleGen output)
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: cols oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1
            continue
        odf, sdf = odf[ocols], sdf[ocols]
        bad = 0
        for i in range(len(odf)):
            for c in ocols:
                a, b = odf[c].iloc[i], sdf[c].iloc[i]
                if norm(a) != norm(b):
                    if bad < 3:
                        print(f"  {name} row {i} col {c}: oracle={a!r} spark={b!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} value mismatches")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(odf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    survey_drift = check_survey_inventory(out)
    sys.exit(1 if (n_fail or survey_drift) else 0)

def check_survey_inventory(out):
    """SURVEY.md section 2 is the audited inventory; the registry must not
    outrun it (r8 verdict item 4). Only meaningful on a FULL verify dump
    (every registered query present as an output dir)."""
    import re
    survey_path = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    if not os.path.exists(survey_path):
        return 0
    dumped = {d for d in os.listdir(out)
              if d.startswith("q_") and os.path.isdir(os.path.join(out, d))}
    oracle = set(json.load(open(f"{out}/oracle_sql.json")))
    if not dumped or len(dumped) < len(oracle):
        return 0  # filtered/partial run — inventory check not applicable
    survey = set(re.findall(r"`(q_[a-z0-9_]+)`", open(survey_path).read()))
    undocumented = sorted(dumped - survey)
    if undocumented:
        print(f"SURVEY DRIFT: {len(undocumented)} registered queries have "
              f"no SURVEY.md row: {', '.join(undocumented)}")
        return 1
    return check_streaming_inventory(survey_path)

def check_streaming_inventory(survey_path):
    """Every StreamingSpec scenario label (test names starting "S<N> ")
    must have a B-9 row in SURVEY.md — the streaming twin of the q_* guard
    above (r9 verdict item 2: S8/S22/S23 were implemented and green but
    undocumented, and the q_*-only guard couldn't see it)."""
    import re
    spec_path = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                             "scala", "graft", "StreamingSpec.scala")
    if not os.path.exists(spec_path):
        return 0
    spec = set(re.findall(r'test\("(S\d+)[ :]', open(spec_path).read()))
    # B-9 rows start "| S<N> |"; prose mentions don't count as inventory
    survey_rows = set(re.findall(r"^\| (S\d+) \|", open(survey_path).read(),
                                 re.MULTILINE))
    undocumented = sorted(spec - survey_rows, key=lambda s: int(s[1:]))
    if undocumented:
        print(f"SURVEY DRIFT: {len(undocumented)} streaming scenarios have "
              f"no SURVEY.md B-9 row: {', '.join(undocumented)}")
        return 1
    return 0

if __name__ == "__main__":
    main()
