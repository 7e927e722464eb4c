#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB-oracle correctness gate.

Not part of the engine (the engine is pure Scala/Spark): this script just
lets the build loop check, before committing, that each SparkEntry query
matches its declared oracle SQL at sf0.01 the same way the driver will.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return repr(v)


def table_rows(names, cols):
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = list(zip(*[cols[i] for i in order])) if cols else []
    return sorted(tuple(norm_cell(c) for c in r) for r in rows), [names[i] for i in order]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            s_names = spark_tbl.schema.names
            s_cols = [spark_tbl.column(i).to_pylist() for i in range(len(s_names))]
            s_rows, s_sorted = table_rows(s_names, s_cols)

            duck = con.sql(sql).fetch_arrow_table()
            d_names = duck.schema.names
            d_cols = [duck.column(i).to_pylist() for i in range(len(d_names))]
            d_rows, d_sorted = table_rows(d_names, d_cols)
        except Exception as e:
            print(f"FAIL {name}: ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue

        if s_sorted != d_sorted:
            print(f"FAIL {name}: columns spark={s_sorted} duck={d_sorted}")
            n_fail += 1
        elif s_rows != d_rows:
            d_set, s_set = set(d_rows), set(s_rows)
            only_s = [r for r in s_rows if r not in d_set][:3]
            only_d = [r for r in d_rows if r not in s_set][:3]
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            for r in only_s:
                print(f"   spark-only: {r}")
            for r in only_d:
                print(f"   duck-only:  {r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracles)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
