#!/usr/bin/env python3
"""Drift-normalized round-over-round bench comparison (VERDICT r10
item 2).

The box shows load tides that move even untouched sub-0.2s queries by
20-40% between close snapshots, so a raw round-over-round table cannot
distinguish a real plan regression from protocol noise. This tool
divides every overlap delta by the CANARY DRIFT — the median ratio of
the ten never-touched canary queries Bench.scala times 5x (median)
each close. A drift-normalized ratio near 1.0 means "moved with the
box"; a normalized ratio well above 1.0 is a candidate real
regression worth a BenchOne rerun.

Fallback: if the older snapshot predates the canary block (r10 and
earlier), canary drift is estimated from the same ten query names in
its "queries" map (best-of-3 instead of median-of-5 — noisier but
directionally right).

Usage: python3 tools/bench_compare.py <old_bench.json> <new_bench.json>
"""
import json
import statistics
import sys

CANARY_NAMES = [
    "q01_pricing_summary", "q02_surrogate_key", "q06_try_numeric",
    "q07_signed_amount", "q11_filter_project", "q13_left_join",
    "q14_distinct", "q123_chisq_independence", "q127_trimmed_stats",
    "q156_ohlc_bars"]


def canary_times(d):
    if d.get("canaries"):
        return d["canaries"]
    return {k: d["queries"][k] for k in CANARY_NAMES if k in d.get("queries", {})}


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    co, cn = canary_times(old), canary_times(new)
    shared = sorted(set(co) & set(cn))
    if not shared:
        print("no shared canaries; raw comparison only")
        drift = 1.0
    else:
        ratios = [cn[k] / co[k] for k in shared if co[k] > 0]
        drift = statistics.median(ratios)
        print(f"canary drift (median of {len(ratios)}): x{drift:.3f}")
        for k in shared:
            print(f"  {k}: {co[k]:.3f} -> {cn[k]:.3f} (x{cn[k]/co[k]:.2f})")
    if old.get("loadavg") or new.get("loadavg"):
        print(f"loadavg old={old.get('loadavg')} new={new.get('loadavg')}")
    qo, qn = old["queries"], new["queries"]
    overlap = sorted(set(qo) & set(qn))
    rows = []
    for k in overlap:
        if qo[k] <= 0 or qn[k] <= 0:
            continue
        raw = qn[k] / qo[k]
        rows.append((k, qo[k], qn[k], raw, raw / drift))
    rows.sort(key=lambda r: -r[4])
    norm = [r[4] for r in rows]
    print(f"\noverlap: {len(rows)} queries; raw total "
          f"{sum(qo[k] for k in overlap):.1f}s -> {sum(qn[k] for k in overlap):.1f}s; "
          f"median normalized ratio x{statistics.median(norm):.3f}")
    flagged = [r for r in rows if r[4] > 1.3 and r[2] > 0.3]
    print(f"\ncandidate real regressions (normalized > x1.3 and new > 0.3s): {len(flagged)}")
    for k, a, b, raw, nr in flagged[:25]:
        print(f"  {k}: {a:.2f}s -> {b:.2f}s raw x{raw:.2f} normalized x{nr:.2f}")
    improved = [r for r in rows if r[4] < 0.75 and r[1] > 0.3]
    print(f"\nreal improvements (normalized < x0.75 and old > 0.3s): {len(improved)}")
    for k, a, b, raw, nr in improved[:25]:
        print(f"  {k}: {a:.2f}s -> {b:.2f}s raw x{raw:.2f} normalized x{nr:.2f}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
