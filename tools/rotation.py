#!/usr/bin/env python3
"""Compute the next driver-window rotation (least-recently-sampled-first
policy, SURVEY §8 / VERDICT r7 #5).

Ranks every catalog entry by (last driver-sampled round, catalog
position) from the union of CORRECTNESS_r*.json and prints the head-50
to paste into queries.py's _ROTATION{N}_HEAD, with this round's new
gates (entries with no driver row AND not in any prior rotation head)
forced to the front. Usage::

    python tools/rotation.py [--new gate1,gate2] [--window 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", default="", help="comma-separated new gates to force in")
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in f.rsplit("_r", 1)[1] if c.isdigit()))
        for k in json.load(open(f)):
            last[k] = max(last.get(k, 0), rnd)

    from storm_spark.queries import QUERIES

    keys = list(QUERIES)
    forced = [k for k in args.new.split(",") if k]
    unknown = [k for k in forced if k not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown gates: {unknown}")
    never = [k for k in keys if k not in last and k not in forced]
    if never:
        print(f"# note: never-sampled (auto-forced): {never}", file=sys.stderr)
    forced = forced + never
    ranked = sorted(
        (k for k in keys if k not in forced),
        key=lambda k: (last.get(k, 0), keys.index(k)),
    )
    head = (forced + ranked)[: args.window]
    print(f"# head-{args.window}: {len(forced)} forced, "
          f"stalest last-rounds {sorted({last.get(k, 0) for k in head if k not in forced})}",
          file=sys.stderr)
    for k in head:
        print(f'    "{k}",')


if __name__ == "__main__":
    main()
