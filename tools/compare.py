#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (CORRECTNESS gate).

Usage: python3 tools/compare.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet dump written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with the test
tables registered as views, sorts columns by name + rows by all values,
and diffs. Exit code 1 if any query mismatches.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def normalize(df):
    df = df[sorted(df.columns)]
    # stable stringification: NaN/None → '<null>'; floats via repr
    def cell(v):
        if v is None:
            return "<null>"
        if isinstance(v, float):
            if math.isnan(v):
                return "<null>"
            return repr(v)
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failed.append(name)
            continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetch_df()
            exp = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        gc, gr = normalize(got)
        ec, er = normalize(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            failed.append(name)
        elif gr != er:
            n = sum(1 for a, b in zip(gr, er) if a != b) + abs(len(gr) - len(er))
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows, ~{n} differing")
            for a, b in list(zip(gr, er))[:2000]:
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
            if len(gr) != len(er):
                sg, se = set(gr), set(er)
                for r in list(sg - se)[:2]:
                    print(f"  only-spark: {r}")
                for r in list(se - sg)[:2]:
                    print(f"  only-duck : {r}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(gr)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} match")
    sys.exit(1 if failed else 0)

main()
