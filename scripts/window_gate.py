#!/usr/bin/env python
"""Throttle gate for the scaling protocol (scripts/run_scaling.sh).

This sandbox's available memory bandwidth drifts several-fold over
minutes, historically concentrated on the largest/last configs — r3/r4
needed manual clean-window attribution for the 4→16 strong pair. The
protocol now brackets every measurement window with a quick membw
spot-probe (scripts/membw_probe.py --spot) and DISCARDS + RE-RUNS any
window whose probe collapsed more than 30% below the round median, so
BASELINE.md publishes numbers from accepted windows only.

Subcommands (window files are /tmp/window_<tag>.json with
{"tag", "pre", "post"}; a window's spot value is min(pre, post)):

  median  <glob>                      → round median spot GB/s
  rejected <glob> --median M          → space-separated rejected tags
  summary <glob> --median M           → gate summary JSON on stdout
"""

from __future__ import annotations

import argparse
import glob as globmod
import json
import statistics

REJECT_BELOW = 0.7  # accept windows whose spot ≥ 70% of the round median


def load(pattern: str) -> list[dict]:
    out = []
    for p in sorted(globmod.glob(pattern)):
        # the glob can catch non-window JSONs (e.g. a `tee`d summary file
        # that exists-but-empty while this very process runs); only
        # {"tag","pre","post"} records are measurement windows
        try:
            w = json.load(open(p))
        except ValueError:
            continue
        if not (isinstance(w, dict) and {"tag", "pre", "post"} <= w.keys()):
            continue
        w["spot"] = min(float(w["pre"]), float(w["post"]))
        out.append(w)
    if not out:
        raise SystemExit(f"no window files match {pattern}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["median", "rejected", "summary"])
    ap.add_argument("glob")
    ap.add_argument("--median", type=float, default=None)
    args = ap.parse_args()
    wins = load(args.glob)
    med = (args.median if args.median is not None
           else statistics.median(w["spot"] for w in wins))
    if args.cmd == "median":
        print(round(med, 2))
        return
    rejected = [w["tag"] for w in wins if w["spot"] < REJECT_BELOW * med]
    if args.cmd == "rejected":
        print(" ".join(rejected))
        return
    print(json.dumps({
        "median_spot_GBps": round(med, 2),
        "reject_below": REJECT_BELOW,
        "accepted": sorted(w["tag"] for w in wins
                           if w["tag"] not in rejected),
        "rejected": sorted(rejected),
        "windows": {w["tag"]: {"pre": w["pre"], "post": w["post"]}
                    for w in wins},
    }))


if __name__ == "__main__":
    main()
