#!/usr/bin/env python3
"""Benchmark harness — runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop writer (full computation, no
driver collect) so timings measure the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

HEADLINE = [
    "q1",
    "each_compute",
    "wordcount",
    "groupby_sum",
    "join_inner",
    "join_nway",
    "topk_per_group",
    "first_n",
    "window_hourly",
    "sessionize",
    "json_extract",
    "dedup_exact",
    "dedup_jaccard",
    "minhash_lsh",
    "simhash",
    "cosine_topk",
    "text_profile",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from storm_spark.queries import QUERIES
    from storm_spark.session import get_spark

    spark = get_spark("storm_spark_bench")
    # JVM/codegen warmup on a trivial action
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s", file=sys.stderr)
        spark.catalog.clearCache()  # drop per-query persisted indexes

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
