"""Capture FINAL (post-AQE) physical-plan shapes at a given scale factor.

Runs each headline query to completion so AQE finalizes its runtime
decisions, then reports the join strategies, exchange count, and AQE
coalesce behavior actually used. Diffing this output between sf0.001 /
sf0.1 / sf1 shows exactly where broadcast joins flip to sort-merge and
how many shuffle partitions AQE settles on — the evidence SCALE.md's
100 TB extrapolation rests on.

    python tools/plan_scale_check.py /root/repo/.localdata/sf1
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q10_returned_items",
    "q_window_frames",
    "q_topk_orders_per_customer",
    "q_minhash_lsh_pairs",
    "q_knn_bruteforce",
    "q_asof_click_purchase",
    "q_events_session",
    "q_cube_flag_status",
    "q_tfidf_top_terms",
]

JOIN_KINDS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def summarize(plan: str) -> str:
    joins = []
    for k in JOIN_KINDS:
        n = len(re.findall(rf"\b{k}\b", plan))
        if n:
            joins.append(f"{k}x{n}" if n > 1 else k)
    n_exch = len(re.findall(r"\bExchange\b|\bAQEShuffleRead\b", plan))
    coalesced = "coalesced" in plan
    final = "isFinalPlan=true" in plan
    skew = "isSkew=true" in plan or "skewed" in plan
    bits = [
        "joins=[" + ",".join(joins) + "]",
        f"exchanges={n_exch}",
        f"aqe_final={final}",
        f"aqe_coalesced={coalesced}",
    ]
    if skew:
        bits.append("skew_handled=true")
    return " ".join(bits)


def main() -> None:
    from aind_exaspim_data_transformation_spark.queries import QUERIES
    from aind_exaspim_data_transformation_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or HEADLINE
    spark = get_spark("plan-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    print(f"# final plans at {sf_dir}")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        t0 = time.time()
        # collect() (not count()) so the action runs THIS DataFrame's
        # QueryExecution and the inspected plan is AQE-final.
        n = len(df.collect())
        dt = time.time() - t0
        plan = df._jdf.queryExecution().explainString(mode)
        print(f"{name}: rows={n} sec={dt:.2f} {summarize(plan)}")


if __name__ == "__main__":
    main()
