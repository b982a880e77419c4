#!/usr/bin/env python3
"""Round-14 decade table: per-query sf100 -> sf1000 comparison.

Pulls the sf100 priors from the committed records (bench_fb_sf100.json
preferred - it has the pair family - then bench_subset_sf100.json) and
the sf1000 numbers from a merged round-14 record (merge_bench.py
output, with per-query calib stamps). Normalized ratio divides each
side by its calib stamp so box drift between JVMs cancels.

usage: decade14.py merged_sf1000.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    cur = load(sys.argv[1])
    priors = {}
    for path in ("bench_subset_sf100.json", "bench_fb_sf100.json"):
        try:
            j = load(path)
            for q, v in j.get("queries", {}).items():
                priors[q] = (v, j.get("calib_sec"),
                             j.get("shuffle_mb", {}).get(q),
                             j.get("spill_mb", {}).get(q))
        except FileNotFoundError:
            pass
    print(f"| query | sf100 s (calib) | sf1000 s (calib) | norm x/decade "
          f"| shuffle MB 100->1000 | spill MB 100->1000 |")
    print("|---|---|---|---|---|---|")
    for q in sorted(cur["queries"]):
        t1 = cur["queries"][q]
        c1 = cur.get("calib_per_query", {}).get(q) or cur.get("calib_sec")
        sh1 = cur.get("shuffle_mb", {}).get(q, 0)
        sp1 = cur.get("spill_mb", {}).get(q, 0)
        if q in priors:
            t0, c0, sh0, sp0 = priors[q]
            norm = (t1 / c1) / (t0 / c0) if c0 and c1 else float("nan")
            print(f"| {q} | {t0:.1f} ({c0}) | {t1:.1f} ({c1}) | "
                  f"{norm:.1f}x | {sh0 or 0:.0f} -> {sh1:.0f} | "
                  f"{sp0 or 0:.0f} -> {sp1:.0f} |")
        else:
            print(f"| {q} | - | {t1:.1f} ({c1}) | - | -> {sh1:.0f} | "
                  f"-> {sp1:.0f} |")


if __name__ == "__main__":
    main()
