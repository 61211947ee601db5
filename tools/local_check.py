#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_check.py <sfDir> <verifyOutDir>

Registers each parquet table as a DuckDB view, runs every statement in
oracle_sql.json, and compares against the Spark-written parquet in
<verifyOutDir>/<name>/ — rows sorted, columns sorted by name, doubles
rounded to 9 decimals before hashing.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 9):.9f}"
    if isinstance(v, list):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    try:  # decimal
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{round(float(v), 9):.9f}"
    except Exception:
        pass
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_val(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got_rel.columns]
            got = norm_rows(got_cols, got_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            exp_rel = con.sql(sql)
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = norm_rows(exp_cols, exp_rel.fetchall())
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
