#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet result, runs the matching SQL from
oracle_sql.json in DuckDB over the sfDir tables, and compares: column names
(sorted), row count, and values (columns sorted by name, rows in result
order). Mirrors the driver's sort-columns-then-hash compare as closely as we
can guess, with exact equality on all values.
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        # exact float identity; -0.0 vs 0.0 and NaN normalized
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck.num_rows}")
            n_fail += 1
            continue
        srows = [tuple(canon(spark_tbl.column(c)[i].as_py()) for c in s_cols)
                 for i in range(spark_tbl.num_rows)]
        drows = [tuple(canon(duck.column(c)[i].as_py()) for c in d_cols)
                 for i in range(duck.num_rows)]
        if srows != drows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  cols : {s_cols}")
            print(f"  spark: {srows[bad]}")
            print(f"  duck : {drows[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({spark_tbl.num_rows} rows)")
        n_pass += 1
    # rows-only queries (no oracle)
    import os
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json" or name in oracle:
            continue
        try:
            n = pq.read_table(f"{out_dir}/{name}").num_rows
            print(f"ROWS {name}: {n} rows")
            n_skip += 1
        except Exception as e:
            print(f"FAIL {name}: unreadable ({e})")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
