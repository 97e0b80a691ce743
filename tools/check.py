#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir] [query ...]

Reads <out>/oracle_sql.json, registers the sf tables as DuckDB views,
runs each oracle, loads the Spark parquet result, and compares:
row count, column names (sorted), and values (rows sorted by all
columns, exact equality; floats compared exactly since both sides round).
"""
import json, math, sys
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0
        return v + 0.0
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
            n_fail += 1
            continue
        etypes = {c: str(exp.schema.field(c).type) for c in ecols}
        gtypes = {c: str(got.schema.field(c).type) for c in gcols}
        if etypes != gtypes:
            print(f"WARN {name}: dtypes differ: spark={gtypes} oracle={etypes}")
        def sortkey(row):
            return tuple((v is None, str(v)) for v in row)
        erows = sorted([tuple(norm(v) for v in row)
                        for row in zip(*[exp.column(c).to_pylist() for c in ecols])],
                       key=sortkey)
        grows = sorted([tuple(norm(v) for v in row)
                        for row in zip(*[got.column(c).to_pylist() for c in gcols])],
                       key=sortkey)
        if len(erows) != len(grows):
            print(f"FAIL {name}: rows {len(grows)} != oracle {len(erows)}")
            n_fail += 1
            continue
        if erows != grows:
            bad = [(i, g, e) for i, (g, e) in enumerate(zip(grows, erows)) if g != e]
            print(f"FAIL {name}: {len(bad)}/{len(erows)} rows differ; first: "
                  f"spark={bad[0][1]} oracle={bad[0][2]} cols={ecols}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(erows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
