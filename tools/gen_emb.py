#!/usr/bin/env python3
"""Embeddings-heavy scale-dir generator (driver-side tooling, like
gen_sf.py — NOT part of the Spark library).

Purpose: measure the PQ family's CAPPED-k linear regime. chooseKsub
grows the per-subspace codebook as ceil(sqrt(n)) until it pins at
k = 256 for n >= 65536; below that the Lloyd cost is n*sqrt(n)
(super-linear by design — the REHEARSAL_r5 18-21x at 10x data), above
it everything is linear in n. The sf dirs top out at 20k embeddings
(sf1), so this tool synthesizes JUST a bigger embeddings.parquet with
the exact gen_sf.py value formula (same hash family, same ranges) and
symlinks every other table from sf0.1 so Bench's loaders resolve.

Usage: python3 tools/gen_emb.py <n_embeddings> <out_dir>
e.g.:  python3 tools/gen_emb.py 65536 /root/repo/.sfdata/emb64k
"""
import os
import sys

import duckdb

BASE = "/root/testdata/sf0.1"


def main(n_emb: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute(f"""
      COPY (
        SELECT i AS vec_id,
          CAST([ (hash(i * 127 + j) % 400001) / 1e6 - 0.2
                 for j in range(0, 64) ] AS FLOAT[]) AS embedding,
          CAST(hash(i + 91) % 10 AS INT) AS label
        FROM range(0, {n_emb}) t(i)
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    n = con.sql(
        f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"embeddings: {n} rows")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    print(f"done -> {out}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
