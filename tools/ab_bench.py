"""Interleaved A/B bench for the scan-bound headline queries.

Round-4 verdict item 1: q01/q03/q05/q10 regressed 18-32% vs round 3 with
disjoint spreads. This harness runs the SAME bench protocol (1 untimed
warm-up + 3 timed runs, median) against two checkouts of the repo,
alternating A/B/B/A per trial pair so machine drift hits both sides
equally, each run in a fresh subprocess (fresh JVM).

Usage:
    python tools/ab_bench.py <repoA> <repoB> [trials=4]

Prints one JSON line with per-query medians-of-medians and all raw runs.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q10_returned_items",
]

CHILD = r"""
import json, os, sys, time, statistics
sys.path.insert(0, sys.argv[1])
from aind_exaspim_data_transformation_spark.queries import QUERIES
from aind_exaspim_data_transformation_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-bench", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
QUERIES["q06_forecast_revenue"](spark, sf_dir).collect()
out = {}
for name in json.loads(sys.argv[2]):
    QUERIES[name](spark, sf_dir).collect()  # warm-up
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).collect()
        runs.append(time.monotonic() - t0)
    out[name] = runs
print("ABRESULT " + json.dumps(out))
"""


def run_side(repo: str) -> dict[str, list[float]]:
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, repo, json.dumps(QUERIES)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"no result from {repo}: rc={proc.returncode}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    raw: dict[str, dict[str, list[float]]] = {
        "A": {q: [] for q in QUERIES},
        "B": {q: [] for q in QUERIES},
    }
    for t in range(trials):
        # ABBA ordering: odd trials run B first.
        order = [("A", repo_a), ("B", repo_b)]
        if t % 2 == 1:
            order.reverse()
        for side, repo in order:
            res = run_side(repo)
            for q, runs in res.items():
                raw[side][q].append(statistics.median(runs))
            print(
                f"trial {t} side {side}: "
                + " ".join(
                    f"{q.split('_')[0]}={statistics.median(r):.3f}"
                    for q, r in res.items()
                ),
                file=sys.stderr,
            )
    summary = {
        q: {
            "A_median": round(statistics.median(raw["A"][q]), 3),
            "B_median": round(statistics.median(raw["B"][q]), 3),
            "A_all": [round(x, 3) for x in raw["A"][q]],
            "B_all": [round(x, 3) for x in raw["B"][q]],
        }
        for q in QUERIES
    }
    print(json.dumps({"repoA": repo_a, "repoB": repo_b, "per_query": summary}))


if __name__ == "__main__":
    main()
