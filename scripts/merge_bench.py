#!/usr/bin/env python3
"""Merge per-query single-JVM bench_subset records into one committed
record.

Round-14 sf1000 runs execute ONE catalog query per JVM (shuffle files
accumulate across queries inside a long-lived local JVM and can exhaust
the fixture disk), so each query gets its own bench_subset.json. This
stitches them back into the committed-record shape (queries/reps/
shuffle_mb/spill_mb maps). Per-run calib stamps are preserved in
`calib_per_query` (the box drifts between JVMs); `calib_sec` is their
median, `load_avg` the max seen.

usage: merge_bench.py out.json in1.json [in2.json ...]
"""
import json
import statistics
import sys


def main() -> None:
    out_path, ins = sys.argv[1], sys.argv[2:]
    queries, reps, shuffle, spill, calibs, loads = {}, {}, {}, {}, {}, []
    sf = None
    for path in ins:
        with open(path) as f:
            j = json.load(f)
        sf = j.get("sf", sf)
        loads.append(j.get("load_avg", 0))
        for q, v in j.get("queries", {}).items():
            queries[q] = v
            calibs[q] = j.get("calib_sec")
            if q in j.get("reps", {}):
                reps[q] = j["reps"][q]
            if q in j.get("shuffle_mb", {}):
                shuffle[q] = j["shuffle_mb"][q]
            if q in j.get("spill_mb", {}):
                spill[q] = j["spill_mb"][q]
    rec = {
        "metric": "total",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "load_avg": max(loads) if loads else 0,
        "calib_sec": round(statistics.median(
            [c for c in calibs.values() if c is not None]), 3),
        "calib_per_query": calibs,
        "queries": queries,
        "reps": reps,
        "subset": sorted(queries),
        "shuffle_mb": shuffle,
        "spill_mb": spill,
        "one_jvm_per_query": True,
        "sf": sf,
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=False)
    print(f"{out_path}: {len(queries)} queries, total {rec['value']}s")


if __name__ == "__main__":
    main()
