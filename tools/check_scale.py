#!/usr/bin/env python3
"""Oracle compare with a per-query DuckDB timeout — for scale-rehearsal
gates (sf1+) where some NAIVE oracles (deliberately quadratic, e.g. the
all-pairs fuzzy-join reference) are infeasible on the oracle side while
the Spark side is fine. Same normalization as local_check.py.

Usage: python3 tools/check_scale.py <sf_dir> <out_dir> [timeout_s]
Prints PASS / FAIL / ORACLE_TIMEOUT per query plus a summary; exit 1
only on FAIL (timeouts are reported, not failures — the Spark result is
simply unverifiable by the naive oracle at this scale).
"""
import json
import os
import sys
import threading

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from local_check import TABLES, norm_df  # noqa: E402


def main(sf_dir, out_dir, timeout_s=180.0):
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_timeout = n_skip = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = norm_df(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"SKIP {name}: no spark output ({type(e).__name__})")
            n_skip += 1
            continue
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            exp = norm_df(con.sql(sql).df())
        except duckdb.InterruptException:
            print(f"ORACLE_TIMEOUT {name} (> {timeout_s:.0f}s)")
            n_timeout += 1
            continue
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            if "interrupt" in msg.lower():
                print(f"ORACLE_TIMEOUT {name} (> {timeout_s:.0f}s)")
                n_timeout += 1
            else:
                print(f"FAIL {name}: oracle SQL error: {msg}")
                n_fail += 1
            continue
        finally:
            timer.cancel()
        if got[0] != exp[0]:
            print(f"FAIL {name}: columns spark={got[0]} duck={exp[0]}")
            n_fail += 1
        elif len(got[1]) != len(exp[1]):
            print(f"FAIL {name}: rows spark={len(got[1])} duck={len(exp[1])}")
            n_fail += 1
        else:
            bad = [(g, e) for g, e in zip(got[1], exp[1]) if g != e]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(got[1])} rows differ; "
                      f"first:\n   spark: {bad[0][0]}\n   duck : {bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got[1])} rows)")
                n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{n_timeout} oracle-timeout, {n_skip} skipped")
    return 1 if n_fail else 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0
    sys.exit(main(sys.argv[1], sys.argv[2], t))
