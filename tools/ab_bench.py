"""Interleaved A/B bench: the drift-proof comparison protocol.

Round-7 verdict (What's wrong #2): identical bench-path code measured
14.24-15.74 s across same-day runs — machine drift the same size as the
regressions the bench must catch. Single-sided timings cannot separate
the two; alternating the SAME workload between two checkouts in ABBA
order cancels drift, because any slow minute hits both sides.

Each side runs the bench protocol (1 untimed warm-up + 3 timed runs,
median) in a fresh subprocess (fresh JVM). Sides may be repo paths or
``git:<commit-ish>`` specs — the latter materializes a temporary git
worktree of that commit (removed on exit), so comparing HEAD against
the previous round's pinned commit is one command:

    python tools/ab_bench.py . git:7d74be1 [trials=4] [--queries a,b,c]

Prints one JSON line with per-query medians-of-medians, B/A ratios, and
all raw runs. Default query set = bench.py's relational/dedup headline
rows (queries only — the conversion benches have their own warm-up
protocol and dominate wall time).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q10_returned_items",
    "q_cube_flag_status",
    "q_window_frames",
    "q_topk_orders_per_customer",
    "q_events_session",
    "q_asof_click_purchase",
    "q_minhash_lsh_pairs_capped",
    "q_text_tfidf_top_term",
    "q_knn_bruteforce",
    "q_shard_grid",
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
    if name not in QUERIES:  # query may not exist on the old side
        out[name] = None
        continue
    QUERIES[name](spark, sf_dir).collect()  # warm-up
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).collect()
        runs.append(time.monotonic() - t0)
    out[name] = runs
print("ABRESULT " + json.dumps(out))
"""


def run_side(repo: str, queries: list[str]) -> dict[str, list[float] | None]:
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, repo, json.dumps(queries)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"no result from {repo}: rc={proc.returncode}\n{proc.stderr[-2000:]}"
    )


# git: specs resolve against THIS repo regardless of invocation cwd.
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def materialize(spec: str, scratch: str, tag: str) -> str:
    """Resolve a side spec to a repo path; git: specs get a worktree."""
    if not spec.startswith("git:"):
        return os.path.abspath(spec)
    commit = spec[len("git:"):]
    path = os.path.join(scratch, f"side_{tag}")
    proc = subprocess.run(
        ["git", "worktree", "add", "--detach", path, commit],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"git worktree add {commit!r} failed (rc={proc.returncode}):\n"
            f"{proc.stderr.strip()}"
        )
    return path


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    queries = DEFAULT_QUERIES
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            queries = a.split("=", 1)[1].split(",")
    spec_a, spec_b = args[0], args[1]
    trials = int(args[2]) if len(args) > 2 else 4

    with tempfile.TemporaryDirectory() as scratch:
        repo_a = materialize(spec_a, scratch, "A")
        repo_b = materialize(spec_b, scratch, "B")
        try:
            raw: dict[str, dict[str, list[float]]] = {
                "A": {q: [] for q in queries},
                "B": {q: [] for q in queries},
            }
            for t in range(trials):
                # ABBA ordering: odd trials run B first.
                order = [("A", repo_a), ("B", repo_b)]
                if t % 2 == 1:
                    order.reverse()
                for side, repo in order:
                    res = run_side(repo, queries)
                    for q, runs in res.items():
                        if runs is not None:
                            raw[side][q].append(statistics.median(runs))
                    print(
                        f"trial {t} side {side}: "
                        + " ".join(
                            f"{q}={statistics.median(r):.3f}"
                            for q, r in res.items()
                            if r is not None
                        ),
                        file=sys.stderr,
                    )
        finally:
            for path in (repo_a, repo_b):
                if path.startswith(scratch):
                    subprocess.run(
                        ["git", "worktree", "remove", "--force", path],
                        cwd=REPO,
                        capture_output=True,
                    )
    summary = {}
    for q in queries:
        a_runs, b_runs = raw["A"][q], raw["B"][q]
        entry = {
            "A_median": round(statistics.median(a_runs), 3) if a_runs else None,
            "B_median": round(statistics.median(b_runs), 3) if b_runs else None,
            # MIN across per-JVM medians is the drift-robust estimator:
            # interference and JVM-lottery effects only ADD time, so the
            # min converges to the noise-free cost while the median
            # carries the (correlated, one-sided) JVM variance — round-9
            # diagnosis: per-JVM totals on IDENTICAL code spread +/-9%.
            "A_min": round(min(a_runs), 3) if a_runs else None,
            "B_min": round(min(b_runs), 3) if b_runs else None,
            "A_all": [round(x, 3) for x in a_runs],
            "B_all": [round(x, 3) for x in b_runs],
        }
        if a_runs and b_runs:
            entry["B_over_A"] = round(
                statistics.median(b_runs) / statistics.median(a_runs), 3
            )
            entry["B_over_A_min"] = round(min(b_runs) / min(a_runs), 3)
        summary[q] = entry
    both = [q for q in queries if raw["A"][q] and raw["B"][q]]
    totals = {
        "A_median_sum": round(
            sum(statistics.median(raw["A"][q]) for q in both), 3
        ),
        "B_median_sum": round(
            sum(statistics.median(raw["B"][q]) for q in both), 3
        ),
        "A_min_sum": round(sum(min(raw["A"][q]) for q in both), 3),
        "B_min_sum": round(sum(min(raw["B"][q]) for q in both), 3),
    }
    totals["B_over_A_min_total"] = round(
        totals["B_min_sum"] / totals["A_min_sum"], 4
    )
    print(
        json.dumps(
            {"repoA": spec_a, "repoB": spec_b, "trials": trials,
             "totals": totals, "per_query": summary}
        )
    )


if __name__ == "__main__":
    main()
