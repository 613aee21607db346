"""Per-round benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "headline_total", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is materialized through the `noop` sink so the full plan
executes distributed (scan → shuffle → sink) with zero driver-side
collect cost — the same shape a cluster run would have. Queries cover
every engine domain: the flagship CDC document pipeline, scan-heavy
aggregation, the big header⨝line join, window functions, MinHash-LSH
near-dedup, similarity top-k, and text scoring.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "cdc_flagship_documents",  # union → latest-per-key → join → nested docs → top-k
    "cdc_net_changes_enriched",  # CDC scan + broadcast enrichment join
    "rel_pricing_summary",  # TPC-H Q1 shape: full lineitem scan + grouped agg
    "rel_header_line_view",  # 600k ⨝ 150k denormalization join
    "rel_customer_order_stats",  # join + agg + having
    "win_order_ranks",  # partitioned ranking window
    "dd_exact",  # hash dedup over documents
    "dd_near_dup_pairs",  # MinHash → LSH bands → Jaccard verify
    "sim_topk_cosine",  # brute-force cosine top-k over embeddings
    "txt_quality_score",  # scan-speed text heuristics
    "evt_tumbling_hourly",  # event-time tumbling window rollup
    "mm_decode_features",  # mapInPandas binary decode path (Arrow batches)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from sql_cdc_spark.session import get_spark

    spark = get_spark("bench")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # JVM/codegen warm-up so q1 doesn't pay session-start costs
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
