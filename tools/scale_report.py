#!/usr/bin/env python3
"""Turn the scale-rehearsal bench sweep into SCALE_MEASURED.md.

Inputs: three one-line bench JSONs produced by `graft.Bench <query-set>`
at sf0.1 (real testdata), sf0.5 and sf1 (ScaleGen-upsampled), all at
SPARK_GRAFT_CPUS=32 on a quiet host, same query set.

Per query we report raw seconds at each scale and two growth numbers:
  - x(0.1→1): t_sf1 / t_sf0.1 against the 10× data growth
  - e(0.5→1): log2(t_sf1 / t_sf0.5) — the scaling exponent over the
    cleanest doubling (the 0.1 point is fixed-overhead-polluted: at 32
    cores a 0.3 s query is all JVM/plan latency, so its ratios read
    sublinear no matter what the algorithm does).
Classification: e <= 1.15 linear-or-better, <= 1.35 mildly superlinear
(watch), > 1.35 flagged for a fix or a documented accepted-cost rationale.
Queries under 1 s at sf1 are reported but not classified — they are
latency-bound, not throughput-bound, at every measured scale.
"""
import json
import math
import sys


def load(path):
    s = open(path).read()
    return json.loads(s[s.index("{"):])


# Accepted-cost rationales for queries whose growth is the documented
# price of their semantics — flagged rows land here instead of the fix
# list, with the pointer a reviewer needs.
ACCEPTED = {
    "q_subsample_ci": (
        "medians are selected from per-value HISTOGRAMS (cumulative-count "
        "pick), which is what makes the operator flat at scale: at sf0.1 "
        "the value domain is barely saturated (583k distinct cents of "
        "600k rows) so the per-value aggregate costs ~1.5x there, while "
        "at sf1 the same domain serves 6M rows and the measured time "
        "dropped 40.3 s -> 13.0 s vs the row-rank formulation."),
    "q_dedup_embed": (
        "exact cosine-threshold self-join at 0.45 — BELOW the "
        "LSH-discriminable regime (random-pair cosine concentrates as "
        "N(0, 1/sqrt(d)); the measured bucket gate passed 98.4% of pairs "
        "and tripled runtime), so the operator is Ω(n²) by nature; the "
        "blocked-GEMM kernel controls the constant and per-task memory, "
        "and since r12 the MaxExactPairRows guard (2M rows) bounds the "
        "total bill — a corpus-scale call fails toward semDedup / the "
        "gated path instead of running for days. "
        "See Similarity.cosinePairsExact scaladoc. At the measured sizes "
        "it is still shuffle-bound (e(0.5→1)=0.8, not 2.0); the decade "
        "ratio reflects leaving the overhead-bound regime. An RP-prefilter "
        "ahead of the kernel was MEASURED AND REJECTED in r14 "
        "(tools/rp_prefilter_probe.py, full 2M-pair sweep): the only "
        "oracle-safe (lossless) margin — the certain Cauchy–Schwarz bound "
        "k·d = 1024 — pruned 0 pairs (observed ratio max 53), and the best "
        "lossy margin keeping 100% recall on the measured data pruned "
        "39.8% against the prefilter's own ~25% kernel-cost overhead; "
        "see the cosinePairsExact scaladoc for the concentration argument."),
    "q_bitext_margin": (
        "brute-force EVAL operator: one src×tgt exact kernel pass is the "
        "operator's definition (the margin needs both directional "
        "neighbourhoods), so doubling both sides quadruples kernel evals "
        "— e(1→2)≈2 is the semantics, not a plan defect. The bill is "
        "HARD-BOUNDED since r12: the broadcast side is capped at "
        "MaxBroadcastEvalSide=65536 rows (in-plan guard, explained "
        "failure), and the operator's scaladoc documents the production "
        "swap (ANN candidate stack + this exact scoring tail). Kept in "
        "the solo sweep precisely to measure the quadratic honestly."),
}


# Spot-check adjudications: suite-context artifacts resolved by a solo
# re-measure at the same scales (fresh JVM per scale, same harness).
# Each entry records the adjudicated SOLO exponent; the exemption only
# applies while the current measurement stays within SPOT_MARGIN of it —
# a future run with a genuinely regressed exponent re-enters the flag
# list instead of being suppressed by a stale adjudication.
SPOT_MARGIN = 0.25
SPOT_NOTES = {}


def spot_exempt(k, e2):
    n = SPOT_NOTES.get(k)
    return n is not None and abs(e2 - n["solo_e2"]) <= SPOT_MARGIN


def main():
    a = load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf0.1.json")
    b = load(sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf0.5.json")
    c = load(sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_sf1.json")
    out = sys.argv[4] if len(sys.argv) > 4 else "SCALE_MEASURED.md"
    rows = []
    for k in sorted(a["queries"]):
        t1, t5, t10 = a["queries"][k], b["queries"][k], c["queries"][k]
        x = t10 / t1
        e = math.log(t10 / t5, 2)
        if t10 < 1.0:
            cls = "latency-bound"
        elif k in ACCEPTED and (e > 1.15 or x > 12):
            cls = "accepted-cost (see notes)"
        elif e <= 1.15 and x <= 12:
            cls = "linear-or-better"
        elif e <= 1.35:
            cls = "mildly superlinear (watch)"
        else:
            cls = "SUPERLINEAR (flag)"
        rows.append((k, t1, t5, t10, x, e, cls))
    rows.sort(key=lambda r: -r[5])
    lines = []
    w = lines.append
    w("# SCALE_MEASURED — sf0.1 → sf0.5 → sf1 rehearsal")
    w("")
    w("Measured scaling of the heavy half of the bench suite plus the")
    w("dedup/ANN stack on ScaleGen-upsampled data (replica upsampling that")
    w("multiplies — not deepens — duplicate/cluster structure; see")
    w("`ScaleGen.scala` scaladoc). All runs: `graft.Bench <set>` at")
    w("`SPARK_GRAFT_CPUS=32`, quiet host, min of two timed passes after a")
    w("full warm-up pass. This file is generated by `tools/scale_report.py`")
    w("from the three bench JSON lines — regenerate, don't hand-edit.")
    w("")
    w(f"Totals: sf0.1 {a['value']:.1f} s · sf0.5 {b['value']:.1f} s · "
      f"sf1 {c['value']:.1f} s over {len(rows)} queries "
      f"(errors: {len(a.get('errors', {}))}/{len(b.get('errors', {}))}/"
      f"{len(c.get('errors', {}))}).")
    w("")
    w("`e(0.5→1)` = log2(t_sf1/t_sf0.5), the scaling exponent over the")
    w("cleanest doubling; 1.0 = perfectly linear in data volume. The")
    w("sf0.1 column is fixed-overhead-polluted for sub-second queries.")
    w("")
    w("| query | sf0.1 s | sf0.5 s | sf1 s | ×(0.1→1) | e(0.5→1) | class |")
    w("|---|---|---|---|---|---|---|")
    for k, t1, t5, t10, x, e, cls in rows:
        w(f"| `{k}` | {t1:.2f} | {t5:.2f} | {t10:.2f} | {x:.1f}× | "
          f"{e:.2f} | {cls} |")
    w("")
    flagged = [r for r in rows if r[6].startswith("SUPERLINEAR")]
    watch = [r for r in rows if r[6].startswith("mildly")]
    accepted = [r for r in rows if r[0] in ACCEPTED]
    w("## Verdict")
    w("")
    if flagged:
        w("Flagged superlinear (needs a fix or a documented accepted-cost")
        w("rationale):")
        for k, *_ in flagged:
            w(f"- `{k}`")
    else:
        w("No query exceeds the 1.35 exponent gate (e(0.5→1) ≤ 1.35 and")
        w("decade ratio ≤ 12× everywhere outside the accepted list).")
    if watch:
        w("")
        w("Watch list (1.15 < e <= 1.35):")
        for k, *_ in watch:
            w(f"- `{k}`")
    if accepted:
        w("")
        w("## Accepted-cost / context notes")
        w("")
        for k, *_ in accepted:
            w(f"- `{k}`: {ACCEPTED[k]}")
    # Optional second doubling: args 5+6 are a heavy-subset run at sf1
    # and the same subset at sf2 (ScaleGen R=20). One doubling can hide
    # a knee; two falsify it for the plans most at risk.
    if len(sys.argv) > 6:
        h1, h2 = load(sys.argv[5]), load(sys.argv[6])
        w("")
        w("## sf2 spot-check (second doubling, heavy subset)")
        w("")
        w("ScaleGen R=20 data; `e(1→2)` = log2(t_sf2/t_sf1) from a "
          "dedicated quiet sf1/sf2 pair run through tools/bench_solo.py "
          "— ONE JVM PER QUERY (in-JVM warm-up + min-of-two, 32g heap: "
          "the 8g default's parquet read-ahead buffers OOM under 32 "
          "concurrent sf2 scans). Per-query isolation removes the "
          "shared-heap channel that inflated q_triangles' in-suite r11 "
          "reading (1.83 in-suite vs 1.09 solo), so exponents here "
          "stand without prose adjudication.")
        w("")
        w("| query | sf1 s | sf2 s | e(1→2) |")
        w("|---|---|---|---|")
        spot = []
        for k in sorted(h1["queries"]):
            if k not in h2["queries"]:
                continue
            ta, tb = h1["queries"][k], h2["queries"][k]
            e2 = math.log(tb / ta, 2)
            spot.append((k, ta, tb, e2))
        for k, ta, tb, e2 in sorted(spot, key=lambda r: -r[3]):
            w(f"| `{k}` | {ta:.2f} | {tb:.2f} | {e2:.2f} |")
        bad = [k for k, _, _, e2 in spot
               if e2 > 1.35 and k not in ACCEPTED and not spot_exempt(k, e2)]
        w("")
        if bad:
            w("Second-doubling flags: " + ", ".join(f"`{k}`" for k in bad))
        else:
            w("No non-accepted query exceeds the 1.35 exponent gate over "
              "the second doubling" +
              (" (suite-context artifacts adjudicated below)."
               if any(k in SPOT_NOTES for k, *_ in spot) else "."))
        accepted2 = [k for k, _, _, e2 in spot
                     if e2 > 1.35 and k in ACCEPTED]
        if accepted2:
            w("")
            w("Accepted-cost over the second doubling:")
            for k in accepted2:
                w(f"- `{k}`: {ACCEPTED[k]}")
        noted = [k for k, *_ in spot if k in SPOT_NOTES]
        if noted:
            w("")
            for k in noted:
                w(f"- `{k}` (adjudicated solo e(1→2) = "
                  f"{SPOT_NOTES[k]['solo_e2']}): {SPOT_NOTES[k]['note']}")
    w("")
    w("## Regenerating")
    w("")
    w("```bash")
    w("sbt 'runMain graft.ScaleGen /root/testdata/sf0.1 scaledata/sf0.5 5'")
    w("sbt 'runMain graft.ScaleGen /root/testdata/sf0.1 scaledata/sf1 10'")
    w("# per scale (quiet host, no concurrent sbt):")
    w("SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=<dir> \\")
    w("  sbt 'runMain graft.Bench <this file's query set, comma-joined>'")
    w("# heavy subset at sf1/sf2: ONE JVM PER QUERY (no shared-heap")
    w("# artifacts) — sbt compile first:")
    w("python3 tools/bench_solo.py scaledata/sf1 heavy_sf1.json <heavy set>")
    w("python3 tools/bench_solo.py scaledata/sf2 heavy_sf2.json <heavy set>")
    w("python3 tools/scale_report.py <sf0.1.json> <sf0.5.json> <sf1.json> \\")
    w("  [SCALE_MEASURED.md <heavy_sf1.json> <heavy_sf2.json>]  # sf2 spot-check")
    w("```")
    w("")
    w("The committed reference runs live in `tools/scale_ledger/` — future")
    w("rounds compare a fresh sweep against them before accepting a plan")
    w("change that moves a scaling exponent.")
    w("")
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(rows)} queries, {len(flagged)} flagged, "
          f"{len(watch)} watch")


if __name__ == "__main__":
    main()
