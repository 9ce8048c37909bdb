#!/usr/bin/env python3
"""Noise-aware bench comparison: diff two `bench_detail.json` artifacts and
flag only CREDIBLE regressions.

The sandbox's bench numbers swing 4-16x under contention (r7 post-mortem:
15x phantom slowdowns that judge re-runs reduced to noise). Since round 8
every rep carries a calibration measurement — a fixed tiny CPU-bound job
timed immediately before the rep — whose wall-clock depends only on machine
load. This script uses those floors to separate signal from contention:

  - a query's comparable cost = its min rep time, scaled by nothing (min is
    already the noise-robust estimator);
  - a regression is CREDIBLE only if the new run's calibration floor (median
    across that query's reps) is not materially worse than the old run's —
    otherwise the machine, not the code, is the suspect.

Usage:
    python3 tools/trend.py OLD_detail.json NEW_detail.json [ratio_threshold]

Exit code 1 if any credible regression exceeds the threshold (default 1.5x).
"""
import json
import statistics
import sys


def load_detail(path):
    """First line of a bench detail artifact: the {"metric":"detail",...} record."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec.get("metric") == "detail":
                return rec
    raise SystemExit(f"{path}: no detail record found")


def mins_of(rec):
    out = {}
    for q, v in rec.get("mins", {}).items():
        # old rounds encoded failures as -1.0; new rounds as null
        if v is not None and v >= 0:
            out[q] = v
    return out


def cal_floor(rec, q, key="calibration"):
    series = rec.get(key, {}).get(q)
    if not series:
        return None
    return statistics.median(series)


def comparable_floors(old, new, q):
    """Machine-comparable = EVERY floor both artifacts carry is within 1.5x.

    The arithmetic spin floor ("calibration") misses memory-bandwidth / GC
    drift (round-8 measurement: same-binary shingle queries 1.3-1.7x apart
    across runs with byte-identical spin floors), so artifacts since then
    also carry an allocation/hashing floor ("calibration_mem"); a slowdown
    is credible only when no available floor moved.
    """
    verdicts = []
    for key in ("calibration", "calibration_mem"):
        oc, nc = cal_floor(old, q, key), cal_floor(new, q, key)
        if oc is not None and nc is not None:
            verdicts.append(nc <= oc * 1.5)
    return all(verdicts) if verdicts else True


def main(old_path, new_path, threshold=1.5):
    old, new = load_detail(old_path), load_detail(new_path)
    om, nm = mins_of(old), mins_of(new)
    shared = sorted(set(om) & set(nm))
    if not shared:
        raise SystemExit("no shared runnable queries between the two artifacts")

    credible, suspect, improved = [], [], []
    for q in shared:
        ratio = nm[q] / om[q] if om[q] > 0 else float("inf")
        oc, nc = cal_floor(old, q), cal_floor(new, q)
        comparable = comparable_floors(old, new, q)
        if ratio >= threshold:
            (credible if comparable else suspect).append((q, ratio, oc, nc))
        elif ratio <= 1 / threshold:
            improved.append((q, ratio, oc, nc))

    def fmt(rows, label):
        if not rows:
            return
        print(f"\n{label}:")
        for q, r, oc, nc in sorted(rows, key=lambda x: -x[1]):
            cal = f" cal {oc:.2f}->{nc:.2f}s" if oc and nc else ""
            print(f"  {q}: {om[q]:.2f}s -> {nm[q]:.2f}s ({r:.2f}x){cal}")

    tot_o, tot_n = sum(om[q] for q in shared), sum(nm[q] for q in shared)
    print(f"{len(shared)} shared runnable queries; "
          f"total {tot_o:.1f}s -> {tot_n:.1f}s ({tot_n / tot_o:.2f}x)")
    only_old = sorted(set(om) - set(nm))
    only_new = sorted(set(nm) - set(om))
    if only_old:
        print(f"dropped/failed in new: {', '.join(only_old)}")
    if only_new:
        print(f"new/recovered: {', '.join(only_new)}")
    fmt(credible, f"CREDIBLE regressions >= {threshold}x (calibration floors comparable)")
    fmt(suspect, "noise-suspect slowdowns (new run's machine was loaded — re-run before believing)")
    fmt(improved, f"improvements >= {threshold}x")
    return 1 if credible else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    th = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], th))
