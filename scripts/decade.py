#!/usr/bin/env python3
"""Catalog-wide decade report: compare two Bench bench_full.json records
(small SF vs a ScaleUp-derived 10x fixture) and print per-query ratios.

Usage: decade.py <bench_full_small.json> <bench_full_big.json> [--md]
"""
import json
import sys


def load(path):
    with open(path) as f:
        rec = json.load(f)
    return rec


def main():
    small = load(sys.argv[1])
    big = load(sys.argv[2])
    md = "--md" in sys.argv
    qs = small["queries"]
    qb = big["queries"]
    rows = []
    for name in qs:
        a, b = qs.get(name, -1), qb.get(name, -1)
        if a is None or b is None or a < 0 or b < 0:
            rows.append((name, a, b, None))
        else:
            rows.append((name, a, b, b / max(a, 1e-9)))
    rows.sort(key=lambda r: -(r[3] or float("inf")))

    ok = [r for r in rows if r[3] is not None]
    ratios = sorted(r[3] for r in ok)

    def pct(p):
        return ratios[min(len(ratios) - 1, int(p * len(ratios)))]

    print(f"queries={len(rows)} compared={len(ok)} "
          f"total {small['value']:.1f}s -> {big['value']:.1f}s "
          f"({big['value']/small['value']:.2f}x for 10x data)")
    print(f"ratio p50={pct(.5):.2f} p90={pct(.9):.2f} max={ratios[-1]:.2f} "
          f"min={ratios[0]:.2f}; loads {small.get('load_avg')}/{big.get('load_avg')}")
    # host-speed honesty: when both records carry the data-independent
    # calib stamp, report how much of any ratio is just the box moving
    ca, cb = small.get("calib_sec"), big.get("calib_sec")
    if ca and cb:
        print(f"calib {ca:.3f}s -> {cb:.3f}s (box factor {cb/ca:.2f}x; "
              f"divide ratios by it for plan-only growth)")
    fmt = "| {} | {:.2f} | {:.2f} | {:.2f}x |" if md else "{:28s} {:8.2f} {:8.2f} {:7.2f}x"
    for name, a, b, r in rows:
        if r is None:
            print(f"{name}: MISSING/ERRORED ({a}, {b})")
        elif not md or r >= 2.0:
            print(fmt.format(name, a, b, r))


if __name__ == "__main__":
    main()
