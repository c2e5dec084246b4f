#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB with views over <sfDir>/*.parquet, loads the Spark parquet result from
<verifyOutDir>/<name>/, canonicalizes both (column names sorted, rows sorted by
all columns, values stringified) and compares.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, float):
            if v != v:
                return "nan"
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        return str(v)

    out = df.apply(lambda c: c.map(cell))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        elif not got.equals(want):
            diff = (got != want).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {int(diff.sum())}/{len(got)} rows differ; first:")
            for i in idx:
                print(f"  spark:  {got.loc[i].to_dict()}")
                print(f"  duckdb: {want.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: {len(oracle) - n_fail}/{len(oracle)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
