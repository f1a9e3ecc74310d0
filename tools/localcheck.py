#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads Verify.scala output (<out>/<name>/part-*.parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf tables, and compares:
row count, schema (column names), and a value hash with columns sorted by
name. Usage: localcheck.py <sfDir> <verifyOut>
"""
import glob
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    return df


def hash_df(df):
    import pandas as pd
    import hashlib
    h = hashlib.md5()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            vals = s.astype(str).tolist()
        elif str(s.dtype).startswith("float"):
            vals = [repr(round(v, 9)) if v == v else "nan" for v in s.tolist()]
        elif str(s.dtype).startswith("datetime"):
            vals = s.astype("datetime64[us]").astype(str).tolist()
        else:
            vals = s.astype(str).tolist()
        h.update(("\x00".join([c] + vals)).encode())
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/part-*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet({files!r})").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got, want = canon(got), canon(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        hg, hw = hash_df(got), hash_df(want)
        if hg != hw:
            print(f"FAIL {name}: hash mismatch")
            for c in got.columns:
                if got[c].astype(str).tolist() != want[c].astype(str).tolist():
                    diffs = [(i, a, b) for i, (a, b) in
                             enumerate(zip(got[c].tolist(), want[c].tolist()))
                             if str(a) != str(b)][:3]
                    print(f"  col {c}: first diffs {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
