#!/usr/bin/env python
"""Compare two clocks.txt phase-timing reports.

The performance-regression analog of the reference's
tools/compare_clocks.py (which diffs FMS mpp_clock hierarchies between
a PR build and the target build): feed it the clocks.txt files written
by two solo-driver runs and it prints per-phase wall-time ratios,
flagging phases that slowed beyond the threshold.

Usage: python tools/compare_clocks.py BASE.txt NEW.txt [--threshold 1.2]
"""

from __future__ import annotations

import argparse
import re
import sys


def parse_report(path: str) -> dict[str, float]:
    """phase name → total seconds from a ClockRegistry report
    (columns: clock, calls, total[s], mean[ms], max[ms])."""
    out = {}
    pat = re.compile(r"^\s*(\S.*?)\s+(\d+)\s+([0-9.eE+-]+)"
                     r"\s+([0-9.eE+-]+)\s+([0-9.eE+-]+)\s*$")
    for line in open(path):
        m = pat.match(line.rstrip())
        if m and m.group(1).strip() != "clock":
            out[m.group(1).strip()] = float(m.group(3))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.2,
                    help="flag phases slower than base by this ratio")
    args = ap.parse_args(argv)
    base = parse_report(args.base)
    new = parse_report(args.new)
    if not base or not new:
        print("could not parse clock phases from one of the inputs",
              file=sys.stderr)
        return 2
    names = sorted(set(base) | set(new))
    width = max(len(n) for n in names)
    regressions = 0
    print(f"{'phase'.ljust(width)}  {'base[s]':>10} {'new[s]':>10} "
          f"{'ratio':>7}")
    for n in names:
        b = base.get(n)
        w = new.get(n)
        if b is None or w is None:
            tag = "(only in new)" if b is None else "(only in base)"
            print(f"{n.ljust(width)}  {'-' if b is None else f'{b:10.3f}'}"
                  f" {'-' if w is None else f'{w:10.3f}'}        {tag}")
            continue
        ratio = w / b if b > 0 else float("inf")
        flag = "  <-- SLOWER" if ratio > args.threshold else ""
        if flag:
            regressions += 1
        print(f"{n.ljust(width)}  {b:10.3f} {w:10.3f} {ratio:7.2f}"
              f"{flag}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
