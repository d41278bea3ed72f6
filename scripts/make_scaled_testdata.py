#!/usr/bin/env python3
"""Replicate a testdata SF directory N× for scale-slope measurement.

    python scripts/make_scaled_testdata.py BASE_DIR OUT_DIR FACTOR

Replication preserves the statistical shape a real N×-bigger dataset
would have, which naive row duplication does NOT:

- **Fact/dim keys shift by a per-table stride** (computed from the
  base data), so FK joins stay 1:N — duplicating orderkeys verbatim
  would square the orders⋈lineitem output and measure a different
  query.
- **Document text is word-salted per replica** (every word suffixed
  ``_r<k>``): word-3-gram shingle sets become disjoint across
  replicas, so near-dup candidate pairs grow ~linearly (each replica
  keeps its internal dup structure) instead of every doc gaining
  N−1 exact copies and the within-bucket pair term going quadratic.
  ``n_chars`` is recomputed to stay consistent with the mutated text.
- **Embeddings rotate by ``r mod d`` dims and negate for r ≥ d**
  (norm-preserving, fresh directions), so cosine blocking sees new
  vectors rather than N copies collapsing into the same LSH cells.
- **Events replicate per-user** (user/event ids shift, timestamps
  unchanged): every replica user has the original's exact series, so
  sessionization/window state grows linearly with users — the way
  production traffic actually grows.
- region/nation stay fixed (dimension tables that do not scale with
  volume, as in TPC-H).

DuckDB does the rewrite (columnar read → cross join range(N) →
COPY TO parquet); the output is read by Spark like any other SF dir.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES_COPY = ["region", "nation"]


def scale(base: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{base}/{t}.parquet')"

    def stride(t: str, key: str) -> int:
        (mx,) = con.execute(f"SELECT MAX({key}) FROM {src(t)}").fetchone()
        return int(mx) + 1

    s_cust = stride("customer", "c_custkey")
    s_supp = stride("supplier", "s_suppkey")
    s_part = stride("part", "p_partkey")
    s_ord = stride("orders", "o_orderkey")
    s_doc = stride("documents", "doc_id")
    s_vec = stride("embeddings", "vec_id")
    s_evt = stride("events", "event_id")
    s_usr = stride("events", "user_id")
    (dim,) = con.execute(
        f"SELECT len(embedding) FROM {src('embeddings')} LIMIT 1"
    ).fetchone()

    rep = f"CROSS JOIN range({factor}) rep(r)"
    jobs = {
        "customer": f"""
            SELECT c_custkey + r * {s_cust} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')} {rep}""",
        "supplier": f"""
            SELECT s_suppkey + r * {s_supp} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM {src('supplier')} {rep}""",
        "part": f"""
            SELECT p_partkey + r * {s_part} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {src('part')} {rep}""",
        "orders": f"""
            SELECT o_orderkey + r * {s_ord} AS o_orderkey,
                   o_custkey + r * {s_cust} AS o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')} {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + r * {s_ord} AS l_orderkey,
                   l_partkey + r * {s_part} AS l_partkey,
                   l_suppkey + r * {s_supp} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')} {rep}""",
        "events": f"""
            SELECT event_id + r * {s_evt} AS event_id, ts,
                   user_id + r * {s_usr} AS user_id, event_type, value, props
            FROM {src('events')} {rep}""",
        "documents": f"""
            SELECT doc_id + r * {s_doc} AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE array_to_string(list_transform(
                               string_split(text, ' '),
                               w -> w || '_r' || r), ' ') END AS text,
                   lang, source,
                   CAST(length(CASE WHEN r = 0 THEN text
                        ELSE array_to_string(list_transform(
                               string_split(text, ' '),
                               w -> w || '_r' || r), ' ') END)
                        AS INTEGER) AS n_chars
            FROM {src('documents')} {rep}""",
        "embeddings": f"""
            SELECT vec_id + r * {s_vec} AS vec_id,
                   list_transform(range({dim}),
                     i -> CAST((CASE WHEN r >= {dim} THEN -1 ELSE 1 END)
                          * embedding[((i + r) % {dim}) + 1] AS FLOAT)
                   ) AS embedding,
                   label
            FROM {src('embeddings')} {rep}""",
    }
    for t in TABLES_COPY:
        con.execute(
            f"COPY (SELECT * FROM {src(t)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, q in jobs.items():
        con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        (n,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        print(__doc__)
        raise SystemExit(2)
    scale(sys.argv[1], sys.argv[2], int(sys.argv[3]))
