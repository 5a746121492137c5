"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query set: one representative per operator class of SURVEY.md §2 —
fixed-length match (1-3 hops), variable-length {1,2}, ANY SHORTEST,
pagerank/wcc/lcc, summarize, plus the pipeline operators (dedup,
similarity, text, as-of, windows).  Each timing is a full execution
(count() action) of a cold plan; the Spark session and the testdata
views are warmed once before timing so we measure the operators, not
session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckpgq_extension_spark import entry_queries as EQ  # noqa: E402
from duckpgq_extension_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "match_1hop",
    "match_2hop",
    "match_triangle",
    "match_undirected",
    "var_length_1_2",
    "shortest_len",
    "reachability",
    "cheapest_path",
    "pagerank",
    "wcc",
    "lcc",
    "summarize",
    "tpch_q1",
    "topk_per_group",
    "asof_join",
    "window_running_sum",
    "events_daily",
    "sessionize",
    "text_stats",
    "dedup_jaccard",
    "dedup_minhash",
    "simhash",
    "similarity_topk",
    "multimodal_decode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="duckpgq_spark_bench")
    # warm up: register views + build the property graph (not timed)
    EQ.setup(spark, sf_dir)
    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = EQ.QUERIES[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt}s ({n} rows)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "total_bench_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
