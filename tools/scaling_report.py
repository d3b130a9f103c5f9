#!/usr/bin/env python3
"""Per-query sf0.1 -> sf1 scaling report for the 100x rehearsal.

Usage: scaling_report.py BENCH_small.json BENCH_big.json [threshold=15]
       [out=SCALING_sf1.json] [--iso BENCH_iso.json]

--iso: a Bench record of ISOLATED re-runs at the big scale. Rounds 11,
13 and 14 each saw a handful of queries inflate 3-10x in the sf1 sweep
from same-JVM contention (188 queries share one heap) and return to
their documented numbers when re-run alone (r11: q89 45x in-sweep, 2.4x
isolated). For every query present in the iso record, the big-side time
becomes min(sweep, isolated min) and the sweep number is kept as
sf1_insweep_sec — the factor then reflects the query, not its sweep
neighbors' GC debris.

Both inputs are graft.Bench full records ({"queries": {...}, ...}),
ideally measured the SAME DAY on the same host (host drift across days
is real — see BASELINE.md round-11 attribution). Prints a markdown
table of every query whose time grew more than `threshold` x for 10x
data, plus the 10 worst scalers, and writes SCALING_sf1.json.
"""
import json
import sys

# Documented expected factors for queries whose x10 cost driver is
# adjudicated LINEAR but structurally above the 15x threshold's
# assumption (r13 verdict item 5). q147 decodes one constant-size 32x32
# PPM per document row from a generated flatMap corpus: per-asset decode
# dominates, so its measured factor on IDENTICAL code+data straddles the
# threshold every rehearsal (r11: 12.3x, r13: 15.3x — BASELINE.md) and
# re-flags adjudicated cost. Entries here are scored on a NORMALIZED
# factor = raw * 10 / expected, so the threshold still catches a real
# super-linear regression (e.g. raw 25x -> normalized 18.5x) while the
# documented envelope stops re-flagging. Both numbers land in the report.
EXPECTED_FACTORS = {
    "q147_image_ahash": {
        "expected": 13.5,
        "why": "constant-size per-asset decode; measured 12.3-15.3x on "
               "identical code+data across rehearsals (r11/r13)",
    },
}


def telemetry_cols(q, tel01, tel1):
    """Per-query shuffle/spill columns (r13 verdict item 6): wall-clock
    factors certify time; these certify STATE growth. Bench records the
    raw counters under "telemetry"; here each query gains the sf1 values
    plus the x10 growth factor of shuffle write — the number that must
    stay near-linear for the 100x claim to hold."""
    a, b = tel01.get(q), tel1.get(q)
    if not a or not b:
        return {}
    sw01, sw1 = a.get("shuffle_write_bytes", 0), b.get("shuffle_write_bytes", 0)
    cols = {
        "sf1_shuffle_write_mb": round(sw1 / 1e6, 2),
        "sf1_spill_disk_mb": round(b.get("disk_spill_bytes", 0) / 1e6, 2),
        "sf1_spill_mem_mb": round(b.get("mem_spill_bytes", 0) / 1e6, 2),
        "sf1_peak_task_mem_mb": round(b.get("peak_task_mem_bytes", 0) / 1e6, 2),
    }
    if sw01 > 0:
        cols["shuffle_write_factor"] = round(sw1 / sw01, 2)
    return cols


def state_flags(scored, tel01, tel1, threshold):
    """Queries whose shuffle-write bytes grew more than threshold x for
    10x data AND move at least 100 MB at sf1 — super-linear STATE, the
    unexplained-growth alarm the rehearsal exists to raise (tiny absolute
    movers are excluded: a 2 KB -> 80 KB plan-constant change is not
    state growth)."""
    flags = []
    for q, _, _, _ in scored:
        a, b = tel01.get(q), tel1.get(q)
        if not a or not b:
            continue
        sw01, sw1 = a.get("shuffle_write_bytes", 0), b.get("shuffle_write_bytes", 0)
        if sw01 > 0 and sw1 >= 100e6 and sw1 / sw01 > threshold:
            flags.append({"query": q, "shuffle_write_factor": round(sw1 / sw01, 2),
                          "sf01_mb": round(sw01 / 1e6, 2), "sf1_mb": round(sw1 / 1e6, 2)})
    return sorted(flags, key=lambda r: -r["shuffle_write_factor"])


def main():
    argv = list(sys.argv)
    iso = {}
    if "--iso" in argv:
        i = argv.index("--iso")
        iso_rec = json.load(open(argv[i + 1]))
        iso = {q: s["min"] for q, s in iso_rec.get("spread", {}).items()
               if s.get("min", -1) >= 0}
        del argv[i:i + 2]
    rec01 = json.load(open(argv[1]))
    rec1 = json.load(open(argv[2]))
    sf01, sf1 = rec01["queries"], rec1["queries"]
    tel01 = rec01.get("telemetry", {})
    tel1 = rec1.get("telemetry", {})
    threshold = float(argv[3]) if len(argv) > 3 else 15.0
    out_path = argv[4] if len(argv) > 4 else "SCALING_sf1.json"
    insweep = {}
    for q, t in iso.items():
        if q in sf1 and sf1[q] > t:
            insweep[q] = sf1[q]
            sf1 = dict(sf1)
            sf1[q] = t
    rows = []
    unscored = []  # (query, reason) — coverage gaps between the two runs
    for q in sorted(set(sf01) | set(sf1)):
        t01, t1 = sf01.get(q), sf1.get(q)
        if t01 is None:
            unscored.append((q, "missing_in_small_run"))
        elif t1 is None:
            unscored.append((q, "missing_in_big_run"))
        elif t01 <= 0 or t1 <= 0:
            unscored.append((q, f"non_positive_time(small={t01},big={t1})"))
        else:
            rows.append((q, t01, t1, t1 / t01))
    scored = [r for r in rows if r[3] is not None]
    worst = sorted(scored, key=lambda r: -r[3])[:10]

    def scoring_factor(q, raw):
        exp = EXPECTED_FACTORS.get(q)
        return raw * 10.0 / exp["expected"] if exp else raw

    over = [r for r in scored if scoring_factor(r[0], r[3]) > threshold]
    normalized = [
        {"query": q, "raw_factor": round(f, 2),
         "normalized_factor": round(scoring_factor(q, f), 2),
         "expected": EXPECTED_FACTORS[q]["expected"],
         "why": EXPECTED_FACTORS[q]["why"]}
        for q, _, _, f in scored if q in EXPECTED_FACTORS]

    print(f"queries: {len(scored)} scored / {len(rows) + len(unscored)} total; "
          f"total {sum(r[1] for r in scored):.1f}s (sf0.1) -> "
          f"{sum(r[2] for r in scored):.1f}s (sf1)")
    if unscored:
        print(f"\n## {len(unscored)} unscored (coverage gaps)")
        for q, why in unscored:
            print(f"- {q}: {why}")
    print(f"\n## {len(over)} queries over {threshold}x for 10x data")
    print("| query | sf0.1 s | sf1 s | factor |")
    print("|---|---|---|---|")
    for q, a, b, f in sorted(over, key=lambda r: -r[3]):
        print(f"| {q} | {a:.2f} | {b:.2f} | {f:.1f}x |")
    print("\n## 10 worst scalers")
    print("| query | sf0.1 s | sf1 s | factor |")
    print("|---|---|---|---|")
    for q, a, b, f in worst:
        print(f"| {q} | {a:.2f} | {b:.2f} | {f:.1f}x |")
    with open(out_path, "w") as f:
        json.dump({
            "threshold": threshold,
            "normalized": normalized,
            "n_scored": len(scored),
            "total_sf01_sec": round(sum(r[1] for r in scored), 2),
            "total_sf1_sec": round(sum(r[2] for r in scored), 2),
            "over_threshold": [
                {"query": q, "sf01_sec": round(a, 3), "sf1_sec": round(b, 3),
                 "factor": round(fac, 2)}
                for q, a, b, fac in sorted(over, key=lambda r: -r[3])],
            "worst10": [
                {"query": q, "sf01_sec": round(a, 3), "sf1_sec": round(b, 3),
                 "factor": round(fac, 2)}
                for q, a, b, fac in worst],
            "queries": {q: dict(
                {"sf01_sec": round(a, 3), "sf1_sec": round(b, 3),
                 "factor": round(fac, 2)},
                **(({"sf1_insweep_sec": round(insweep[q], 3)}
                    if q in insweep else {})),
                **telemetry_cols(q, tel01, tel1))
                        for q, a, b, fac in scored},
            "iso_rechecked": sorted(insweep),
            "state_growth_over_threshold": state_flags(scored, tel01, tel1,
                                                       threshold),
            "unscored": [{"query": q, "reason": why} for q, why in unscored],
        }, f, indent=1)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
