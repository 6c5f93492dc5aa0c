"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All query implementations live in
``aind_exaspim_data_transformation_spark.queries`` (one module per
operator family, registered via the ``@query`` decorator).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aind_exaspim_data_transformation_spark.queries import (  # noqa: E402
    ORACLES,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def _last_sampled_round() -> dict[str, int]:
    """Map query name -> most recent round whose CORRECTNESS_r{N}.json
    sampled it (the driver checks the FIRST 50 of ``queries()``).

    Used to rotate least-recently-driver-checked queries to the front so
    the cumulative driver-verified union converges to the whole registry
    instead of re-sampling whatever happens to be newest (round-12
    verdict Next #1: 99/174 names had never appeared in any driver
    artifact).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as fh:
                entries = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(entries, dict):
            continue
        for name, rec in entries.items():
            # A recorded FAILURE does not count as "sampled": keep the
            # query at the front of the rotation so the driver re-checks
            # it next round instead of burying it for ~3 rounds.
            if isinstance(rec, dict) and (
                rec.get("err") or rec.get("hash_match") is False
            ):
                continue
            last[name] = max(last.get(name, -1), rnd)
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered least-recently-driver-sampled first (never-sampled names
    lead, in registry order) so the driver's first-50 correctness
    sample sweeps the whole registry across rounds.
    """
    last = _last_sampled_round()
    names = list(QUERIES)
    order = {n: i for i, n in enumerate(names)}
    names.sort(key=lambda n: (last.get(n, -1), order[n]))
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (subset: non-SQL-expressible
    operators are intentionally absent -> driver records rows-only)."""
    return dict(ORACLES)
