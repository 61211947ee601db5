#!/usr/bin/env python3
"""Local scale-rehearsal data generator (driver-side tooling, like
local_check.py — NOT part of the Spark library).

Generates an sfN directory with the same schemas and distribution shape
as the driver-provided /root/testdata/sf0.1 tables, at `mult` times the
sf0.1 row counts (mult=10 -> sf1). Deterministic: every value is a pure
hash of the row id (no RNG state), so re-runs are identical. Fixed
dimensions (region, nation) are copied verbatim; everything else is
synthesized with matching key ranges, categorical sets, value ranges
and (for lineitem->orders) the same Poisson-ish fan-out that falls out
of uniform key hashing.

Usage: python3 tools/gen_sf.py <mult> <out_dir>
e.g.:  python3 tools/gen_sf.py 10 /root/repo/.sfdata/sf1
"""
import os
import sys

import duckdb

BASE = "/root/testdata/sf0.1"


def main(mult: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # fixed dims: verbatim
    for t in ("region", "nation"):
        copy(f"SELECT * FROM '{BASE}/{t}.parquet'", t)

    n_cust = 15000 * mult
    n_supp = 1000 * mult
    n_part = 20000 * mult
    n_ord = 150000 * mult
    n_li = 600000 * mult
    n_ev = 100000 * mult
    n_doc = 5000 * mult
    n_emb = 2000 * mult

    copy(f"""
      SELECT i AS c_custkey,
        printf('Customer#%09d', i) AS c_name,
        CAST(hash(i + 11) % 25 AS INT) AS c_nationkey,
        round((hash(i + 12) % 1100000) / 100.0 - 1000, 2) AS c_acctbal,
        ['MACHINERY','AUTOMOBILE','HOUSEHOLD','BUILDING','FURNITURE']
          [CAST(hash(i + 13) % 5 AS INT) + 1] AS c_mktsegment
      FROM range(0, {n_cust}) t(i)""", "customer")

    copy(f"""
      SELECT i AS s_suppkey,
        printf('Supplier#%09d', i) AS s_name,
        CAST(hash(i + 21) % 25 AS INT) AS s_nationkey,
        round((hash(i + 22) % 1100000) / 100.0 - 1000, 2) AS s_acctbal
      FROM range(0, {n_supp}) t(i)""", "supplier")

    # part-name vocabulary: reuse the sf0.1 adjective x noun sets
    adjs = [r[0] for r in con.sql(
        f"SELECT DISTINCT string_split(p_name, ' ')[1] FROM "
        f"'{BASE}/part.parquet' ORDER BY 1").fetchall()]
    nouns = [r[0] for r in con.sql(
        f"SELECT DISTINCT string_split(p_name, ' ')[2] FROM "
        f"'{BASE}/part.parquet' ORDER BY 1").fetchall()]
    adj_sql = "[" + ",".join(f"'{a}'" for a in adjs) + "]"
    noun_sql = "[" + ",".join(f"'{n}'" for n in nouns) + "]"
    copy(f"""
      SELECT i AS p_partkey,
        {adj_sql}[CAST(hash(i + 31) % {len(adjs)} AS INT) + 1] || ' ' ||
        {noun_sql}[CAST(hash(i + 32) % {len(nouns)} AS INT) + 1] AS p_name,
        'Brand#' || CAST(hash(i + 33) % 25 AS VARCHAR) AS p_brand,
        ['ECONOMY','LARGE','STANDARD','MEDIUM','SMALL','PROMO']
          [CAST(hash(i + 34) % 6 AS INT) + 1] AS p_type,
        CAST(hash(i + 35) % 50 + 1 AS INT) AS p_size,
        round(900 + (i % 1000) / 10.0, 1) AS p_retailprice
      FROM range(0, {n_part}) t(i)""", "part")

    copy(f"""
      SELECT i AS o_orderkey,
        CAST(hash(i + 41) % {n_cust} AS BIGINT) AS o_custkey,
        ['O','P','F'][CAST(hash(i + 42) % 3 AS INT) + 1] AS o_orderstatus,
        round(1000 + (hash(i + 43) % 49900000) / 100.0, 2) AS o_totalprice,
        TIMESTAMP '1995-01-01' +
          INTERVAL (hash(i + 44) % 2404) DAY AS o_orderdate,
        ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
          [CAST(hash(i + 45) % 5 AS INT) + 1] AS o_orderpriority
      FROM range(0, {n_ord}) t(i)""", "orders")

    copy(f"""
      SELECT CAST(hash(i + 51) % {n_ord} AS BIGINT) AS l_orderkey,
        CAST(hash(i + 52) % {n_part} AS BIGINT) AS l_partkey,
        CAST(hash(i + 53) % {n_supp} AS BIGINT) AS l_suppkey,
        CAST(hash(i + 54) % 7 + 1 AS INT) AS l_linenumber,
        CAST(hash(i + 55) % 50 + 1 AS DOUBLE) AS l_quantity,
        round((hash(i + 55) % 50 + 1) *
              (900 + (hash(i + 56) % 11000) / 10.0) / 1.0, 2)
          AS l_extendedprice,
        (hash(i + 57) % 11) / 100.0 AS l_discount,
        (hash(i + 58) % 9) / 100.0 AS l_tax,
        ['N','A','R'][CAST(hash(i + 59) % 3 AS INT) + 1] AS l_returnflag,
        ['O','F'][CAST(hash(i + 60) % 2 AS INT) + 1] AS l_linestatus,
        TIMESTAMP '1995-01-02' +
          INTERVAL (hash(i + 61) % 2498) DAY AS l_shipdate
      FROM range(0, {n_li}) t(i)""", "lineitem")

    # events: ids in arrival order over the same 30-day span, +-10 s jitter
    copy(f"""
      SELECT i AS event_id,
        TIMESTAMP '2024-01-01' + INTERVAL (
          CAST(i * (2592000000000.0 / {n_ev}) AS BIGINT)
          + CAST(hash(i + 71) % 20000000 AS BIGINT) - 10000000
        ) MICROSECOND AS ts,
        CAST(hash(i + 72) % {150 * mult * 10} AS BIGINT) AS user_id,
        ['signup','click','error','view','purchase']
          [CAST(hash(i + 73) % 5 AS INT) + 1] AS event_type,
        round((hash(i + 74) % 56022) / 100.0, 2) AS value,
        '{{"k": ' || CAST(hash(i + 75) % 100 AS VARCHAR) || '}}' AS props
      FROM range(0, {n_ev}) t(i)""", "events")

    # documents: token soup over the sf0.1 vocabulary, 10..100 tokens,
    # ~0.2% exact duplicates of an earlier doc (text is a pure function
    # of the source id, so the dup is computed, not copied)
    vocab = [r[0] for r in con.sql(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) FROM "
        f"'{BASE}/documents.parquet' ORDER BY 1").fetchall()]
    vocab_sql = "[" + ",".join(f"'{w}'" for w in vocab) + "]"
    nv = len(vocab)
    copy(f"""
      WITH ids AS (
        SELECT i,
          CASE WHEN i >= 100 AND hash(i + 82) % 500 = 0
               THEN i - 1 - CAST(hash(i + 83) % 99 AS BIGINT)
               ELSE i END AS src_i
        FROM range(0, {n_doc}) t(i)
      ), toks AS (
        SELECT i, j,
          {vocab_sql}[1 + CAST(hash(src_i * 1000003 + j) % {nv} AS INT)]
            AS w
        FROM ids, range(0, 101) r(j)
        WHERE j < 10 + CAST(hash(src_i + 81) % 91 AS BIGINT)
      )
      SELECT i AS doc_id, string_agg(w, ' ' ORDER BY j) AS text,
        ['en','de','fr','es','zh'][CAST(hash(i + 84) % 5 AS INT) + 1]
          AS lang,
        'src' || CAST(hash(i + 85) % 20 AS VARCHAR) AS source,
        length(string_agg(w, ' ' ORDER BY j)) AS n_chars
      FROM toks GROUP BY i""", "documents")

    copy(f"""
      SELECT i AS vec_id,
        CAST([ (hash(i * 127 + j) % 400001) / 1e6 - 0.2
               for j in range(0, 64) ] AS FLOAT[]) AS embedding,
        CAST(hash(i + 91) % 10 AS INT) AS label
      FROM range(0, {n_emb}) t(i)""", "embeddings")

    print(f"done -> {out}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
