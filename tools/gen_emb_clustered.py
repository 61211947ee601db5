#!/usr/bin/env python3
"""Clustered embeddings scale-dir generator (driver-side tooling, like
gen_emb.py — NOT part of the Spark library).

Purpose: the round-7 ANN recall measurement ran on NO-STRUCTURE
synthetic vectors (honest worst case: recall tracks the scanned
fraction because there are no clusters for the IVF coarse quantizer to
exploit). This tool synthesizes the REALISTIC regime at the same n: a
mixture of `C` well-separated centers (coordinates uniform in [-1, 1],
hash-deterministic) with isotropic Irwin-Hall(2) noise (sum of two
uniforms — triangular, sigma ~ noise/sqrt(6)), so nearest neighbors
are overwhelmingly intra-cluster and a cell-probing index can shine.
Schema matches gen_emb.py exactly (vec_id, embedding FLOAT[64], label =
the true mixture component); every other table symlinks from sf0.1.

Usage: python3 tools/gen_emb_clustered.py <n_embeddings> <out_dir> [C]
e.g.:  python3 tools/gen_emb_clustered.py 131072 /root/repo/.sfdata/embc128k
"""
import os
import sys

import duckdb

BASE = "/root/testdata/sf0.1"


def main(n_emb: int, out: str, c: int = 64,
         salt: int = 0, id_offset: int = 0) -> None:
    """salt shifts the CENTER hash (salt=c -> c entirely new mixture
    centers: the distribution-drift corpus for the IVF-PQ staleness
    measurement); id_offset keeps vec_ids disjoint from the base corpus
    so the drift rows can be appended to an existing index."""
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    noise = 0.08  # per-coordinate amplitude; centers are ~1.15 apart rms
    con.execute(f"""
      COPY (
        SELECT i + {id_offset} AS vec_id,
          CAST([ (hash((hash(i + 7) % {c} + {salt}) * 131 + j) % 2001) / 1e3 - 1
                 + {noise} * ((hash((i + {id_offset}) * 127 + j) % 400001) / 2e5
                              + (hash((i + {id_offset}) * 631 + j) % 400001) / 2e5 - 2)
                 for j in range(0, 64) ] AS FLOAT[]) AS embedding,
          CAST(hash(i + 7) % {c} + {salt} AS INT) AS label
        FROM range(0, {n_emb}) t(i)
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    n = con.sql(
        f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"embeddings: {n} rows, {c} mixture components")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    print(f"done -> {out}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 64,
         int(sys.argv[4]) if len(sys.argv) > 4 else 0,
         int(sys.argv[5]) if len(sys.argv) > 5 else 0)
