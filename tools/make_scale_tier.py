"""Materialize an on-disk scale tier by id-shifted replication of an
existing testdata directory (default: sf0.1 x 10 = "sf1").

Unlike tools/scale_probe.py (in-memory replication of two tables for
kernel growth factors), this writes REAL parquet files for every table,
so the full bench path — parquet scan, PushedFilters, view registration,
graph DDL — runs unchanged at 10x scale: point SPARK_GRAFT_SF_DIR (or
bench.py's sf1 section) at the output directory.

Replication scheme: K id-shifted copies of each fact table; each key
column shifts by `copy * base_cardinality` so every FK stays in-domain
and the key spaces remain contiguous (the derived c_edges view's
`o_orderkey % count(customer)` then spans copies, yielding one large
connected graph rather than K disjoint clones — deliberately, disjoint
copies would parallelize trivially and overstate scaling).  Dimension
tables (region, nation) stay fixed, TPC-H-style.  Uniqueness-bearing
non-key columns are disambiguated per copy (c_name/s_name are graph keys
in social_s); document text is perturbed per copy so dedup operators see
a realistic corpus instead of a degenerate all-duplicates one (exact-dup
rate stays ~ the base tier's); embeddings perturb one coordinate per
copy to break ANN ties.

Generation is DuckDB (single-process, ~seconds at 170 MB); determinism
follows from the base tables being deterministic and the transforms
being pure.

Usage: python tools/make_scale_tier.py [K] [src_dir] [out_dir]
Defaults: K=10, /root/testdata/sf0.1, /root/repo/data/scale/sf1
"""

from __future__ import annotations

import os
import sys

BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
    "events_users": 1_500,
}


def make_scale_tier(k: int = 10, src: str = "/root/testdata/sf0.1",
                    out: str = "/root/repo/data/scale/sf1") -> str:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT * FROM range({k}) t(copy)")

    def t(name: str) -> str:
        return f"'{src}/{name}.parquet'"

    def write(name: str, sql: str) -> None:
        # small row groups so Spark's file-split parallelism is real: a
        # split can't be finer than a row group, and broadcast-join
        # pipelines (no shuffle) inherit the scan's task count
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 65536)"
        )

    # fixed dimensions
    for dim in ("region", "nation"):
        write(dim, f"SELECT * FROM {t(dim)}")

    c = BASE
    write("customer", f"""
        SELECT c_custkey + copy * {c['customer']} AS c_custkey,
               CASE WHEN copy = 0 THEN c_name
                    ELSE c_name || '#c' || copy END AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')}, copies""")
    write("supplier", f"""
        SELECT s_suppkey + copy * {c['supplier']} AS s_suppkey,
               CASE WHEN copy = 0 THEN s_name
                    ELSE s_name || '#c' || copy END AS s_name,
               s_nationkey, s_acctbal
        FROM {t('supplier')}, copies""")
    write("part", f"""
        SELECT p_partkey + copy * {c['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {t('part')}, copies""")
    write("orders", f"""
        SELECT o_orderkey + copy * {c['orders']} AS o_orderkey,
               o_custkey + copy * {c['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')}, copies""")
    write("lineitem", f"""
        SELECT l_orderkey + copy * {c['orders']} AS l_orderkey,
               l_partkey + copy * {c['part']} AS l_partkey,
               l_suppkey + copy * {c['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')}, copies""")
    write("events", f"""
        SELECT event_id + copy * {c['events']} AS event_id, ts,
               user_id + copy * {c['events_users']} AS user_id,
               event_type, value, props
        FROM {t('events')}, copies""")
    write("documents", f"""
        SELECT doc_id + copy * {c['documents']} AS doc_id,
               CASE WHEN copy = 0 THEN text
                    ELSE text || ' copyword' || copy END AS text,
               lang, source,
               CAST(length(CASE WHEN copy = 0 THEN text
                    ELSE text || ' copyword' || copy END) AS BIGINT)
                   AS n_chars
        FROM {t('documents')}, copies""")
    write("embeddings", f"""
        SELECT vec_id + copy * {c['embeddings']} AS vec_id,
               list_prepend(CAST(embedding[1] + copy * 0.0001 AS FLOAT),
                            embedding[2:]) AS embedding,
               label
        FROM {t('embeddings')}, copies""")
    con.close()
    return out


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/data/scale/sf1"
    path = make_scale_tier(k, src, out)
    print(f"wrote {path} (K={k} from {src})")
