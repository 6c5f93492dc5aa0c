"""Isolated per-query measurement: one fresh JVM per query (round 14).

The full-registry profiler (`opt_profile.py`) ranks queries relative to
one another inside a single JVM; this tool answers the question the
profiler cannot: what does THIS query cost on a clean JVM, with a host
speed probe attached so a drifted reading is named rather than trusted
(CLAUDE.md: this VM swings with hypervisor neighbors).

Usage:
    python tools/isolate_measure.py <sf_dir> <query> [query ...]
    ISO_REPS=3 python tools/isolate_measure.py ...

Per query: fresh JVM, cpu probe (pinned matmul, min of 8), one warm
noop pass, ISO_REPS timed noop passes (plan rebuilt per rep, bench.py
semantics), min reported. Output: one JSON line per query on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("ISO_REPS", "3"))
_TAG = "ISOCHILD "


def _cpu_probe_ms() -> float:
    import numpy as np

    x = np.random.rand(1500, 1500)
    runs = []
    for _ in range(8):
        t0 = time.monotonic()
        x @ x
        runs.append(time.monotonic() - t0)
    return round(min(runs) * 1000, 1)


def _child(sf_dir: str, name: str) -> None:
    from aind_exaspim_data_transformation_spark.queries import QUERIES
    from aind_exaspim_data_transformation_spark.queries.lifecycle import (
        managed_query,
    )
    from aind_exaspim_data_transformation_spark.session import get_spark

    probe = _cpu_probe_ms()
    spark = get_spark("iso-measure")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setJobDescription(f"iso:{name}")
    with managed_query(spark, sf_dir, name) as df:
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        warm = time.monotonic() - t0
        runs = []
        for _ in range(REPS):
            df_rep = QUERIES[name](spark, sf_dir)
            t0 = time.monotonic()
            df_rep.write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
    spark.stop()
    print(
        _TAG
        + json.dumps(
            {
                "query": name,
                "sec": round(min(runs), 3),
                "runs": [round(r, 3) for r in runs],
                "warm_sec": round(warm, 3),
                "cpu_probe_ms": probe,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3])
        return
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    for name in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", sf_dir, name],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        emitted = False
        for line in proc.stdout.splitlines():
            if line.startswith(_TAG):
                print(line[len(_TAG):], flush=True)
                emitted = True
        if not emitted:
            print(
                json.dumps({"query": name, "error": proc.stderr[-800:]}),
                flush=True,
            )


if __name__ == "__main__":
    main()
