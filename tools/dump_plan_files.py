"""Dump `.explain("formatted")` for named queries into plans/<tag>/.

    python tools/dump_plan_files.py <tag> <suffix> <query> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (sf0.001 data,
AQE on, captured pre-execution like tools/dump_plans.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from aind_exaspim_data_transformation_spark.queries import QUERIES
    from aind_exaspim_data_transformation_spark.session import get_spark

    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plan-files", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        plan = (
            QUERIES[name](spark, sf)._jdf.queryExecution().explainString(mode)
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
