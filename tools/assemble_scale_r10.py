"""Assemble SCALE_r10.json from the round-10 sweep logs.

Inputs (produced this round; see ROUND_NOTES 10f/10g):
  /tmp/sf10_json.txt            warmed in-sweep sf10 timings (55/55)
  /tmp/sf30_json.txt            warmed in-sweep sf30 timings (54/54)
  /tmp/sweep_sf30_oracle*.log   sf30 oracle verdicts (chunked runs)
  /tmp/sweep_sf30_heavy4.log    LSH-family retries post-MATERIALIZED fix
  /tmp/sizes_sweep.log          conversion zstd-3 size sweep
"""

from __future__ import annotations

import json
import re

s10 = json.loads(open("/tmp/sf10_json.txt").read())
s30 = json.loads(open("/tmp/sf30_json.txt").read())

oracle: dict[str, str] = {}
# Logs are listed OLDEST-FIRST deliberately: later files are targeted
# retries (post-fix reruns) whose verdicts supersede earlier ones, so
# last-write-wins is the intended merge. If you add a log, keep the
# chronological order.
for log in (
    "/tmp/sweep_sf30_oracle.log",
    "/tmp/sweep_sf30_oracle2.log",
    "/tmp/sweep_sf30_oracle3.log",
    "/tmp/sweep_sf30_heavy4.log",
    "/tmp/sweep_sf30_oracle4.log",
    "/tmp/sweep_sf30_pq2.log",
):
    try:
        text = open(log).read().replace("\r", "\n")
    except OSError:
        continue
    for line in text.splitlines():
        m = re.match(r"\s+(q\S+)\s+[\d.]+s\s+rows=\s*\d+\s+(PASS|FAIL)", line)
        if m:
            # later runs override earlier failures (the MATERIALIZED fix)
            oracle[m.group(1)] = m.group(2)

ratios = {}
for q, v10 in s10["queries"].items():
    v30 = s30["queries"].get(q)
    if v30 and v30.get("sec") and v10.get("sec"):
        ratios[q] = round(v30["sec"] / v10["sec"], 2)

conv = json.loads(
    [l for l in open("/tmp/sizes_sweep.log").read().splitlines() if l.startswith('{"workload"')][-1]
)

n_pass = sum(1 for v in oracle.values() if v == "PASS")
out = {
    "protocol": (
        "tools/scale_sweep.py on local[32], SPARK_DRIVER_MEMORY=48g "
        "(1.5 GB/core; the 8g session default is 0.25 GB/core and OOMs "
        "the sf30 uncapped-LSH row), warmed (CPU probe + tiny scan + "
        "32-partition mapInPandas) before the timed loop. Timing and "
        "oracle runs SEPARATE per round-8 protocol; oracles "
        "ORACLE_DUCKDB_MEM=48-64GB, connection closed per query "
        "(tools/parity.py finally-close). data = tools/gen_testdata.py "
        "sf10/sf30 (180M lineitem / 30M events / 1.5M docs at sf30)."
    ),
    "sf30_oracle_pass": n_pass,
    "sf30_oracle_total_attempted": len(oracle),
    "sf30_oracle": oracle,
    "sf30_infeasible": {
        "q_minhash_lsh_pairs": (
            "UNCAPPED LSH contrast row: pair expansion is "
            "sum-of-bucket^2 over degenerate band buckets (40k pairs "
            "sf1 -> 3.87M sf10 -> ~35M+ sf30); the bands self-join "
            "spilled the box's entire free disk (>73 GB scratch, two "
            "attempts: mid-sweep and isolated) before any result. "
            "This is the failure mode the row exists to demonstrate - "
            "q_minhash_lsh_pairs_capped (production semantics) runs "
            "6.99 s at sf30 and is oracle-PASS. Uncapped row remains "
            "oracle-green at sf0.001-sf10 (SCALE_r08)."
        )
    },
    "oracle_fix": (
        "Round-10: multi-referenced CTEs in the LSH-pairs, n-gram "
        "Jaccard, PQ and k-means oracles marked AS MATERIALIZED "
        "(DuckDB 1.0 inlines by default, recomputing the 300M-row "
        "signature aggregation once per reference at sf30 and "
        "spilling past the disk). Re-verified hash-identical at "
        "sf0.001/sf0.01; the capped-LSH oracle went from >73 GB "
        "disk-death to PASS in ~1 min."
    ),
    "ratios_sf30_over_sf10": ratios,
    "sf10": {q: v["sec"] for q, v in s10["queries"].items()},
    "sf30": {q: v["sec"] for q, v in s30["queries"].items()},
    "sf10_env": s10.get("env"),
    "sf30_env": s30.get("env"),
    "conversion_zstd3_sweep": conv,
}
json.dump(out, open("SCALE_r10.json", "w"), indent=1)
print("sf30_oracle_pass =", n_pass, "/", len(oracle))
print("missing oracle verdicts:", sorted(set(s30["queries"]) - set(oracle)))
