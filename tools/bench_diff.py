#!/usr/bin/env python3
"""Diff two BENCH_full.json records (dev tool, driver-side python).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [ratio_floor]

Prints per-query light-pass movers above the ratio floor (default 1.5x,
both directions, only entries above 0.5 s on either side) and the whole
heavy block side by side with spread, flagging entries that violate the
committed-record gate (spread > 1.5 AND sec > 1.5x old) -> re-measure
those isolated before committing the new record (README "Bench record
policy").
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read())


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"light: old total {old.get('value', 0):.1f} s "
          f"({len(oq)} queries), new total {new.get('value', 0):.1f} s "
          f"({len(nq)} queries)")
    movers = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0 or b <= 0:
            print(f"  FAILED-side entry {name}: old {a} new {b}")
            continue
        r = b / a
        if (r >= floor or r <= 1 / floor) and max(a, b) > 0.5:
            movers.append((r, name, a, b))
    for r, name, a, b in sorted(movers, reverse=True):
        print(f"  {name}: {a:.2f} -> {b:.2f} s ({r:.2f}x)")
    if not movers:
        print(f"  no movers beyond {floor}x above 0.5 s")
    for name in sorted(set(nq) - set(oq)):
        print(f"  new query: {name} {nq[name]:.2f} s")
    for name in sorted(set(oq) - set(nq)):
        print(f"  dropped query: {name}")

    oh = old.get("heavy", {}).get("queries", {})
    nh = new.get("heavy", {}).get("queries", {})
    print("\nheavy (sec, spread; gate = spread>1.5 AND >1.5x old):")
    flagged = []
    for name in sorted(set(oh) | set(nh)):
        a = oh.get(name, {})
        b = nh.get(name, {})
        asec, bsec = a.get("sec"), b.get("sec")
        spread = b.get("spread", 1.0)
        ratio = (bsec / asec) if (asec and bsec and asec > 0) else None
        gate = ratio is not None and spread > 1.5 and ratio > 1.5
        if gate:
            flagged.append(name)
        print(f"  {name}: old {asec if asec is not None else '-'} -> "
              f"new {bsec if bsec is not None else '-'} "
              f"(ratio {f'{ratio:.2f}' if ratio else '-'}, "
              f"spread {spread:.2f}){'  <-- GATE' if gate else ''}")
    if flagged:
        print("\nGATE VIOLATIONS (re-measure isolated, take min):")
        for name in flagged:
            print(f"  SPARK_GRAFT_ONLY={name}")
        sys.exit(1)
    print("\ngate clean: record committable as-is")


if __name__ == "__main__":
    main()
