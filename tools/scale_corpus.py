#!/usr/bin/env python3
"""Generate a 10x (sf1-equivalent) corpus from sf0.1 for the scale
rehearsal (BASELINE.md trend table) -- local measurement tooling, not
part of the Spark library.

Scaling rules (honest linear growth, not adversarial duplication):
  - documents x10: doc_id offset by copy * (max_id + 1); every token in
    copy i > 0 gets the suffix _c<i>, so cross-copy shingle vocabularies
    are DISJOINT -- each copy replicates the original near-dup cluster
    structure instead of gluing all copies into one giant cluster (which
    would grow pair counts 100x and measure an artifact, not scale).
    Copy 0 stays byte-identical, so sf0.1 is a subset. n_chars is
    recomputed from the mutated text.
  - embeddings x10: vec_id offset the same way; vectors are copied
    verbatim (cell/bucket densities grow exactly 10x, which is the
    honest scale path for IVF/LSH; value distributions unchanged).
  - orders x10: o_orderkey offset the same way (stac19's %-grids stay
    uniform; stac20's grid modulus adapts via footer row count).
  - all other tables copied unchanged.

Usage: python3 tools/scale_corpus.py [src_dir] [dst_dir] [copies]
"""
import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1")
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

COPY_AS_IS = ["region", "nation", "customer", "supplier", "part",
              "lineitem", "events"]


def scale_documents(con):
    step = con.sql(f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    con.sql(f"""
        COPY (
          SELECT doc_id + i * {step} AS doc_id,
                 CASE WHEN i = 0 THEN text
                      ELSE regexp_replace(text, '(\\S+)', '\\1_c' || i, 'g') END AS text,
                 lang, source,
                 CAST(length(CASE WHEN i = 0 THEN text
                      ELSE regexp_replace(text, '(\\S+)', '\\1_c' || i, 'g') END) AS BIGINT)
                   AS n_chars
          FROM '{SRC}/documents.parquet',
               (SELECT unnest(generate_series(0, {COPIES - 1})) AS i)
          ORDER BY doc_id
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")


def scale_embeddings(con):
    step = con.sql(f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    con.sql(f"""
        COPY (
          SELECT vec_id + i * {step} AS vec_id, embedding, label
          FROM '{SRC}/embeddings.parquet',
               (SELECT unnest(generate_series(0, {COPIES - 1})) AS i)
          ORDER BY vec_id
        ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")


def scale_orders(con):
    step = con.sql(f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()[0]
    con.sql(f"""
        COPY (
          SELECT o_orderkey + i * {step} AS o_orderkey,
                 o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM '{SRC}/orders.parquet',
               (SELECT unnest(generate_series(0, {COPIES - 1})) AS i)
          ORDER BY o_orderkey
        ) TO '{DST}/orders.parquet' (FORMAT PARQUET)""")


def main():
    DST.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    scale_documents(con)
    scale_embeddings(con)
    scale_orders(con)
    for t in COPY_AS_IS:
        shutil.copy(SRC / f"{t}.parquet", DST / f"{t}.parquet")
    for t in ["documents", "embeddings", "orders"]:
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
