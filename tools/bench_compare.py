#!/usr/bin/env python3
"""Drift-normalized round-over-round bench comparison (VERDICT r10
item 2, windowed per VERDICT r11 item 4).

The box shows load tides that move even untouched sub-0.2s queries by
20-40% between close snapshots, so a raw round-over-round table cannot
distinguish a real plan regression from protocol noise. This tool
divides every overlap delta by the CANARY DRIFT — the ratio of the ten
never-touched canary queries vs their times in the older snapshot.

r11 proved a single end-of-run canary block measures the wrong window:
the driver bench's mid-run load tide inflated 241 queries x1.5 while
the closing canaries read x0.66. Bench.scala now interleaves a canary
pass (all ten, one run each, position + loadavg stamped) every ~45
main-loop queries; when the newer snapshot carries that
"canary_passes" array, each query is normalized by the drift of its
NEAREST pass (main loop runs in sorted query-name order, so a query's
window is its rank). A drift-normalized ratio near 1.0 means "moved
with the box"; well above 1.0 is a candidate real regression worth a
BenchOne rerun.

Fallbacks: no canary_passes -> the end-of-run "canaries" block; no
canaries at all (r10 and earlier) -> the same ten names from the
"queries" map (best-of-3 — noisier but directionally right).

Usage: python3 tools/bench_compare.py <old_bench.json> <new_bench.json>
"""
import json
import statistics
import sys

CANARY_NAMES = [
    "q01_pricing_summary", "q02_surrogate_key", "q06_try_numeric",
    "q07_signed_amount", "q11_filter_project", "q13_left_join",
    "q14_distinct", "q123_chisq_independence", "q127_trimmed_stats",
    "q156_ohlc_bars",
    # r12: mid-weight shuffle/CPU canaries from the box-state cluster
    # the tiny-scan set under-captured (fallback matching only; live
    # canary times come from the snapshot's own canaries block)
    "q224_ks_test", "q230_sprt", "q115_phash_neardup"]


def canary_times(d):
    if d.get("canaries"):
        return d["canaries"]
    return {k: d["queries"][k] for k in CANARY_NAMES
            if k in d.get("queries", {})}


def pass_drifts(new, co):
    """[(pos, drift, loadavg)] per interleaved canary pass vs the old
    baseline canary times."""
    out = []
    for p in new.get("canary_passes", []):
        ratios = [p["t"][k] / co[k] for k in p.get("t", {})
                  if k in co and co[k] > 0]
        if ratios:
            out.append((p["pos"], statistics.median(ratios),
                        p.get("loadavg")))
    return sorted(out)


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    co, cn = canary_times(old), canary_times(new)
    shared = sorted(set(co) & set(cn))
    ratios = [cn[k] / co[k] for k in shared if co[k] > 0]
    if not ratios:
        # no shared canaries, or every old time <= 0 (pre-r10 fallback
        # records failed queries as -1) -- degrade, don't crash
        print("no usable shared canaries; raw comparison only")
        drift = 1.0
    else:
        drift = statistics.median(ratios)
        print(f"canary drift (global median of {len(ratios)}): x{drift:.3f}")
        for k in shared:
            if co[k] > 0:
                print(f"  {k}: {co[k]:.3f} -> {cn[k]:.3f} (x{cn[k]/co[k]:.2f})")
    windows = pass_drifts(new, co)
    if windows:
        print(f"\ninterleaved canary passes ({len(windows)}):")
        for pos, d, la in windows:
            print(f"  pos {pos:4d}: drift x{d:.3f}  loadavg={la}")

    def drift_at(idx):
        """Drift of the canary pass nearest this main-loop position."""
        if not windows:
            return drift
        return min(windows, key=lambda w: abs(w[0] - idx))[1]

    if old.get("loadavg") or new.get("loadavg"):
        print(f"loadavg old={old.get('loadavg')} new={new.get('loadavg')}")
    qo, qn = old["queries"], new["queries"]
    overlap = sorted(set(qo) & set(qn))
    # the main loop runs in sorted query-name order, so a query's loop
    # position in the NEW run is its rank among the new run's queries
    pos_of = {k: i for i, k in enumerate(sorted(qn))}
    rows = []
    for k in overlap:
        if qo[k] <= 0 or qn[k] <= 0:
            continue
        raw = qn[k] / qo[k]
        d = drift_at(pos_of[k])
        rows.append((k, qo[k], qn[k], raw, raw / d))
    rows.sort(key=lambda r: -r[4])
    norm = [r[4] for r in rows]
    print(f"\noverlap: {len(rows)} queries; raw total "
          f"{sum(qo[k] for k in overlap):.1f}s -> "
          f"{sum(qn[k] for k in overlap):.1f}s; "
          f"median normalized ratio x{statistics.median(norm):.3f}")
    flagged = [r for r in rows if r[4] > 1.3 and r[2] > 0.3]
    print(f"\ncandidate real regressions (normalized > x1.3 and "
          f"new > 0.3s): {len(flagged)}")
    for k, a, b, raw, nr in flagged[:25]:
        print(f"  {k}: {a:.2f}s -> {b:.2f}s raw x{raw:.2f} "
              f"normalized x{nr:.2f}")
    improved = [r for r in rows if r[4] < 0.75 and r[1] > 0.3]
    print(f"\nreal improvements (normalized < x0.75 and old > 0.3s): "
          f"{len(improved)}")
    for k, a, b, raw, nr in improved[:25]:
        print(f"  {k}: {a:.2f}s -> {b:.2f}s raw x{raw:.2f} "
              f"normalized x{nr:.2f}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
