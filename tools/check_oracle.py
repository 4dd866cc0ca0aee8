#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB-oracle compare.

Dev tooling only (runs with the driver-side python stack: duckdb, pyarrow,
pandas). Not part of the Spark library.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]
where <verify_out_dir> was produced by `graft.Verify <sf_dir> <verify_out_dir>`.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # driver sorts columns by name before hashing values
    df = df[sorted(df.columns)]
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaN-ish (pandas NaT etc.)
            return True
    except Exception:
        pass
    return a == b


def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        sdf = canon(pq.read_table(files[0]).to_pandas())
        try:
            ddf = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            continue
        bad = None
        for ci, c in enumerate(sdf.columns):
            sv, dv = list(sdf[c]), list(ddf[c])
            for ri in range(len(sv)):
                a, b = sv[ri], dv[ri]
                if hasattr(a, "to_pydatetime"):
                    a = a.to_pydatetime()
                if hasattr(b, "to_pydatetime"):
                    b = b.to_pydatetime()
                if hasattr(a, "item"):
                    a = a.item()
                if hasattr(b, "item"):
                    b = b.item()
                if not values_equal(a, b):
                    bad = (c, ri, a, b)
                    break
            if bad:
                break
        if bad:
            c, ri, a, b = bad
            print(f"FAIL {name}: value mismatch col={c} row={ri} spark={a!r} duck={b!r}")
        else:
            n_ok += 1
            print(f"OK   {name}: {len(sdf)} rows x {len(sdf.columns)} cols")
    print(f"{n_ok}/{len(oracle)} queries match")


if __name__ == "__main__":
    main()
