"""Scale probe: replicate the sf0.1 inputs K times (id-shifted copies —
K x vertices, K x edges / documents) and measure how the heavy kernels
grow, WITHOUT writing any derived data to disk.

This is the direct check behind PERF.md's scale claims: a kernel whose
cost is (rounds x per-round work) should grow sub-linearly in wall time
at fixed round count (more rows per job amortize the per-job floor),
while anything accidentally quadratic shows super-linear growth
immediately.

Usage: python tools/scale_probe.py [K] [sf_dir]   (default K=8, sf0.1)
Prints one line per (kernel, scale) with wall seconds and the growth
factor vs 1x.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from duckpgq_extension_spark import algorithms as A  # noqa: E402
from duckpgq_extension_spark.operators import dedup, paths as pathops  # noqa: E402
from duckpgq_extension_spark.session import get_spark  # noqa: E402


def replicated_graph(spark, sf_dir: str, k: int):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = cust.count()
    copies = spark.range(k).select(F.col("id").alias("copy"))
    verts = (
        cust.select(F.col("c_custkey").cast("long").alias("vid"))
        .crossJoin(copies)
        .select((F.col("vid") + F.col("copy") * n).alias("vid"))
    )
    edges = (
        orders.select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("o_orderkey") % n).cast("long").alias("dst"),
        )
        .crossJoin(copies)
        .select(
            (F.col("src") + F.col("copy") * n).alias("src"),
            (F.col("dst") + F.col("copy") * n).alias("dst"),
        )
    )
    return pathops.materialize(verts), pathops.materialize(edges), n


def replicated_docs(spark, sf_dir: str, k: int):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    copies = spark.range(k).select(F.col("id").alias("copy"))
    out = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * n).alias("doc_id"),
        # perturb each copy so replication doesn't create a degenerate
        # all-duplicates corpus (that is a different, also useful, probe)
        F.concat(F.col("text"), F.lit(" copyword"), F.col("copy").cast("string")).alias(
            "text"
        ),
    )
    return pathops.materialize(out)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base: dict[str, float] = {}
    for scale in (1, k):
        verts, edges, n = replicated_graph(spark, sf_dir, scale)
        docs = replicated_docs(spark, sf_dir, scale)
        seeds = verts.where(F.col("vid") % n < 5)

        def timed(name, fn):
            t0 = time.perf_counter()
            cnt = fn()
            dt = time.perf_counter() - t0
            growth = f" ({dt / base[name]:.2f}x vs 1x)" if scale != 1 else ""
            base.setdefault(name, dt)
            print(f"[{scale}x] {name:16s} {dt:7.2f}s  rows={cnt}{growth}", flush=True)

        timed("pagerank", lambda: A.pagerank(edges, verts, tol=0.0, max_iter=10).count())
        timed("wcc", lambda: A.weakly_connected_component(edges, verts).count())
        timed("scc", lambda: A.strongly_connected_component(edges, verts).count())
        timed("bfs_4hop", lambda: pathops.bfs_distances(edges, sources=seeds.toDF("src"), max_hops=4).count())
        timed("lcc", lambda: A.local_clustering_coefficient(edges, verts).count())
        timed("minhash_pairs", lambda: dedup.minhash_lsh_pairs(docs, "doc_id", "text").count())
        timed("communities", lambda: A.label_propagation(edges, verts, max_iter=5).count())


if __name__ == "__main__":
    main()
