"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced to full materialization with the noop sink (computes
every output column, no write cost), so the timing covers the whole plan —
scan, shuffle, agg — not just a count-star shortcut.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "top_partkeys",
    "dedup_earliest",
    "sources_attach",
    "first_source_counts",
    "hourly_stats",
    "value_quantiles",
    "docs_exact_dedup",
    "docs_ngram_jaccard",
    "docs_minhash_lsh_pairs",
    "docs_simhash",
    "emb_knn",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from mempool_dumpster_spark.plans.registry import all_queries
    from mempool_dumpster_spark.session import get_spark

    spark = get_spark("bench")
    queries = all_queries()

    # Warm-up: run every headline query once at the smallest SF so the timed
    # runs measure steady-state plans (codegen caches, classloading, Arrow
    # init) rather than first-query JVM warm-up.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            try:
                queries[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
