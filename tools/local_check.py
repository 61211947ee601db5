#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_check.py <sfDir> <verifyOutDir>

Registers each parquet table as a DuckDB view, runs every statement in
oracle_sql.json, and compares against the Spark-written parquet in
<verifyOutDir>/<name>/ — rows sorted, columns sorted by name, doubles
rounded to 9 decimals before hashing.

IMPORTANT: both sides are normalized through pandas (`.df()`), exactly like
the driver's gate — NOT via `fetchall()`. The difference is type-sensitive
and was the round-1 local/driver divergence: DuckDB HUGEINT (windowed
BIGINT sums) becomes float64 under pandas and renders "24.000000000",
while fetchall() yields a Python int rendering "24". A local pass here is
meant to PREDICT a driver pass, so we must reproduce the driver's
conversion path, including its inability to handle array columns (those
are reported as failures, as the driver would record an err).
"""
import json
import math
import sys

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    if isinstance(v, (list, np.ndarray)):
        # the driver's pandas sort/hash harness crashes on array columns
        # (TypeError: unhashable type numpy.ndarray) — surface that here
        raise TypeError("array column unsupported by driver harness")
    if isinstance(v, float):  # covers np.float64 (a float subclass)
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 9):.9f}"
    try:  # decimal
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{round(float(v), 9):.9f}"
    except Exception:
        pass
    return str(v)


def norm_df(df):
    """Driver-style normalization: lowercase + name-sorted columns, every
    value rendered type-sensitively from the PANDAS representation, rows
    sorted. Returns (cols, [row tuples])."""
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    rows = [tuple(norm_val(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return list(df.columns), rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            got = norm_df(got_df)
        except Exception as e:
            print(f"FAIL {name}: cannot read/normalize spark output: {e}")
            n_fail += 1
            continue
        try:
            exp = norm_df(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got[0] != exp[0]:
            print(f"FAIL {name}: columns differ: spark={got[0]} duck={exp[0]}")
            n_fail += 1
            continue
        if len(got[1]) != len(exp[1]):
            print(f"FAIL {name}: rowcount spark={len(got[1])} duck={len(exp[1])}")
            n_fail += 1
            continue
        bad = [(g, e) for g, e in zip(got[1], exp[1]) if g != e]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(got[1])} rows differ; first:")
            print(f"   spark: {bad[0][0]}")
            print(f"   duck : {bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got[1])} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
