#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and value-compare against the Spark
parquet written by graft.Verify. Dev-tool only — NOT part of the library.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)          # full precision
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files named {t}.parquet; ScaleUp-derived
        # fixtures are directories of part files under the same name
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ORACLE_ERR {name}: {e}"); n_bad += 1; continue
        spark = pq.read_table(files[0])
        # driver semantics: sort columns by name, then compare values
        dcols = sorted(duck.column_names); scols = sorted(spark.column_names)
        if dcols != scols:
            print(f"SCHEMA   {name}: duck={dcols} spark={scols}"); n_bad += 1; continue
        drows = [tuple(norm(r[c]) for c in dcols) for r in duck.to_pylist()]
        srows = [tuple(norm(r[c]) for c in scols) for r in spark.to_pylist()]
        if drows == srows:
            print(f"OK       {name} ({len(drows)} rows)"); n_ok += 1
        elif sorted(drows) == sorted(srows):
            # The driver gate hashes in row order — an order-only match FAILS
            # there, so it must fail here too (--lenient to downgrade).
            if "--lenient" in sys.argv:
                print(f"ORDER    {name}: values match only after sort ({len(drows)} rows) [lenient]"); n_ok += 1
            else:
                print(f"ORDER    {name}: values match only after sort ({len(drows)} rows) — counted BAD"); n_bad += 1
        else:
            print(f"MISMATCH {name}: duck {len(drows)} rows vs spark {len(srows)}")
            for i,(a,b) in enumerate(zip(drows, srows)):
                if a != b:
                    print(f"  first diff row {i}:\n   duck : {a}\n   spark: {b}"); break
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
