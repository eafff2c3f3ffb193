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
    """→ (windows, broken_tags). A window_<tag>.json that fails to parse
    or lacks pre/post must NOT silently escape the gate — its bench run
    would publish ungated (the exact data the gate exists to discard) —
    so its filename-derived tag is returned for REJECTION. Non-window
    files (names without the window_ prefix, e.g. a tee'd summary caught
    by a loose glob) are still skipped silently."""
    import os

    out, broken = [], []
    for p in sorted(globmod.glob(pattern)):
        base = os.path.basename(p)
        is_window = base.startswith("window_") and base.endswith(".json")
        tag_from_name = base[len("window_"):-len(".json")] if is_window else None
        try:
            w = json.load(open(p))
            if not isinstance(w, dict):
                raise ValueError("not an object")
            w["spot"] = min(float(w["pre"]), float(w["post"]))
        except (ValueError, KeyError, TypeError):
            if tag_from_name:
                broken.append(tag_from_name)
            continue
        out.append(w)
    if not out and not broken:
        raise SystemExit(f"no window files match {pattern}")
    return out, broken


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["median", "rejected", "summary"])
    ap.add_argument("glob")
    ap.add_argument("--median", type=float, default=None)
    args = ap.parse_args()
    wins, broken = load(args.glob)
    med = (args.median if args.median is not None
           else statistics.median(w["spot"] for w in wins) if wins else 0.0)
    if args.cmd == "median":
        print(round(med, 2))
        return
    rejected = [w["tag"] for w in wins if w["spot"] < REJECT_BELOW * med]
    rejected += broken  # unparseable window → its bench must not publish
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
