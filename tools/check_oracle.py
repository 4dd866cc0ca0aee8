#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB-oracle compare.

Dev tooling only (runs with the driver-side python stack: duckdb, pyarrow,
pandas). Not part of the Spark library.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]
where <verify_out_dir> was produced by `graft.Verify <sf_dir> <verify_out_dir>`.
"""
import sys, json, glob, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # driver sorts columns by name before hashing values
    df = df[sorted(df.columns)]
    return df


def norm_type(t):
    """Arrow type → comparison key. Normalizes ONLY what the driver's hash
    normalizes (timestamp unit/tz) plus pure width variants of the same
    logical type (string vs large_string, list vs large_list). Everything
    else — decimal vs int64, int32 vs int64, float vs double, date32 vs
    timestamp — must match exactly, because the driver's hash is
    type-sensitive (round 7: DuckDB HUGEINT vs Spark BIGINT red rows)."""
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{norm_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def schema_diffs(stbl, dtbl):
    """Column-name-aligned arrow type mismatches (names already checked)."""
    diffs = []
    for sf_, df_ in zip(stbl.schema, dtbl.schema):
        if norm_type(sf_.type) != norm_type(df_.type):
            diffs.append((sf_.name, str(sf_.type), str(df_.type)))
    return diffs


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
    try:
        errors = json.load(open(f"{out}/errors.json"))
    except Exception:
        errors = {}
    n_ok = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            why = errors.get(name, "no spark output")
            print(f"FAIL {name}: {why}")
            continue
        stbl = pq.read_table(files[0])
        sdf = canon(stbl.to_pandas())
        try:
            dtbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        ddf = canon(dtbl.to_pandas())
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
            continue
        tdiffs = schema_diffs(stbl.select(sorted(stbl.column_names)),
                              dtbl.select(sorted(dtbl.column_names)))
        if tdiffs:
            for col, st, dt in tdiffs:
                print(f"FAIL {name}: type mismatch col={col} spark={st} duck={dt}")
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
