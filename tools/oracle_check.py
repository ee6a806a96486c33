#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
named after the parquet tables in <sfDir>, reads the Spark result parquet
from <verifyOutDir>/<name>/, sorts columns by name and rows by value, and
compares stringified cells exactly. Prints PASS/FAIL per query.
"""
import json, sys, glob, os
import duckdb

def canon(con, rel):
    df = rel.df()
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return list(df.columns), rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    # Verify emits each oracle under both "<name>" and "<name>.parquet"
    # (driver lookup convention); check each query once, by bare name.
    oracles = {k: v for k, v in oracles.items() if not k.endswith(".parquet")}
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_glob = glob.glob(os.path.join(out_dir, name + ".parquet", "*.parquet"))
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ocols, orows = canon(con, con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, srows = canon(con, con.sql(
            f"SELECT * FROM read_parquet({spark_glob!r})"))
        if ocols != scols:
            print(f"FAIL {name}: schema {scols} != oracle {ocols}")
            n_fail += 1
        elif orows != srows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}, "
                  f"first diffs: {diffs[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
