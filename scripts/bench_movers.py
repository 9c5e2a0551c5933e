"""Drift-normalized round-over-round bench comparison (r13 verdict #2).

Compares two BENCH_FULL files' per-query steady medians.  The raw ratio
new/old confounds code changes with shared-host speed drift (two
same-code runs measured ±4% on old_set in r13, and individual queries
swing far more), so every ratio is also normalized by the measured host
drift — the ratio of the two runs' fixed-calibration-query medians
(bench.py times `CALIBRATION_QUERY` at start, each session recycle, and
end).  Movers are tagged:

  code — still a mover after drift normalization (investigate)
  host — a raw mover that normalization explains away (ignore)

Older BENCH_FULL files predate the `calibration` field; the fallback is
the calibration query's own in-bench steady median, which is the same
measurement taken once instead of ~9 times (noted in the output).

Usage: python scripts/bench_movers.py OLD.json NEW.json
       [--threshold 1.5] [--min-sec 1.0] [--floor 0.3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CALIBRATION_QUERY  # noqa: E402 — repo root on sys.path


def _calibration_median(full: dict) -> tuple[float, str]:
    """(median calibration seconds, provenance note) for one run."""
    cal = full.get("calibration")
    if cal:
        return statistics.median(c["sec"] for c in cal), "sentinel"
    return full["queries"][CALIBRATION_QUERY], "fallback:in-bench"


def compare(old: dict, new: dict, threshold: float, min_sec: float, floor: float):
    """Yields per-query rows plus summary stats; pure for tests."""
    old_cal, old_src = _calibration_median(old)
    new_cal, new_src = _calibration_median(new)
    drift = new_cal / old_cal
    rows = []
    for name, o in old["queries"].items():
        n = new["queries"].get(name)
        if n is None or o < floor:
            continue
        ratio = n / o
        norm = ratio / drift
        big = abs(n - o) > min_sec
        if big and (norm > threshold or norm < 1 / threshold):
            tag = "code"
        elif big and (ratio > threshold or ratio < 1 / threshold):
            tag = "host"
        else:
            tag = ""
        rows.append(
            {
                "query": name,
                "old": o,
                "new": n,
                "ratio": round(ratio, 3),
                "norm_ratio": round(norm, 3),
                "tag": tag,
            }
        )
    ratios = [r["ratio"] for r in rows]
    norms = [r["norm_ratio"] for r in rows]
    summary = {
        "drift": round(drift, 3),
        "old_calibration": (round(old_cal, 3), old_src),
        "new_calibration": (round(new_cal, 3), new_src),
        "n_compared": len(rows),
        "median_ratio": round(statistics.median(ratios), 3) if ratios else None,
        "median_norm_ratio": round(statistics.median(norms), 3) if norms else None,
    }
    return rows, summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=1.0)
    ap.add_argument("--floor", type=float, default=0.3)
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    rows, summary = compare(old, new, args.threshold, args.min_sec, args.floor)
    print(
        f"host drift {summary['drift']} "
        f"(calibration {summary['old_calibration']} -> "
        f"{summary['new_calibration']})"
    )
    print(
        f"{summary['n_compared']} common queries >= {args.floor}s: "
        f"median ratio {summary['median_ratio']} raw, "
        f"{summary['median_norm_ratio']} drift-normalized"
    )
    movers = [r for r in rows if r["tag"]]
    if not movers:
        print("movers: none")
        return
    print(f"{'query':44s} {'old':>7s} {'new':>7s} {'ratio':>6s} {'norm':>6s}  tag")
    for r in sorted(movers, key=lambda r: -r["norm_ratio"]):
        print(
            f"{r['query']:44s} {r['old']:7.3f} {r['new']:7.3f} "
            f"{r['ratio']:6.3f} {r['norm_ratio']:6.3f}  {r['tag']}"
        )


if __name__ == "__main__":
    main()
