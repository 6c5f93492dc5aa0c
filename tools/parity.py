"""Local replica of the driver's correctness harness.

Runs every registered query on Spark and its oracle SQL on DuckDB, then
compares row count, column names, and an order-insensitive value hash —
strictly, so any engine-level nondeterminism (float summation order,
timestamp rendering, decimal types) surfaces here before the driver sees it.

Usage: python tools/parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import traceback

import duckdb
import pandas as pd


def _norm_cell(v):
    """Engine-neutral canonical form of one value."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        # repr keeps full double precision; mismatch in any ulp is flagged.
        return repr(v)
    if isinstance(v, (bool,)):
        return str(int(v))
    if pd.isna(v):
        return "NULL"
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    # Column-wise normalization over plain Python lists: identical cell
    # semantics to the original iterrows() form but ~20x faster, which
    # matters once result sets reach sf1 sizes (10^5+ rows per query).
    cols = sorted(pdf.columns)
    if not cols:
        return []
    norm_cols = [
        [_norm_cell(v) for v in pdf[c].tolist()] for c in cols
    ]
    return sorted(zip(*norm_cols)) if len(pdf) else []


def compare(
    spark_df, oracle_sql: str, sf_dir: str, spark_pdf=None
) -> tuple[bool, str, int | None]:
    """Returns (ok, message, spark_row_count) — the count is structural
    so artifact writers never scrape it out of the message text."""
    con = duckdb.connect()
    # At scale-sweep SFs (sf1/sf10) some oracles build very large
    # intermediates; an explicit cap makes DuckDB spill to disk instead
    # of taking the box down (its default limit is 80% of RAM, shared
    # badly with the Spark JVM + collected result frames).
    mem = os.environ.get("ORACLE_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    try:
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings".split()
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        oracle_pdf = con.execute(oracle_sql).df()
    finally:
        # Close even when the oracle dies (e.g. out of spill disk at
        # sf30): the raised traceback otherwise keeps `con` alive and
        # its tens-of-GB temp files pinned, cascading no-space failures
        # into every later query of a sweep (round-10 incident).
        con.close()
    if spark_pdf is None:
        spark_pdf = spark_df.toPandas()

    n = len(spark_pdf)
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return False, (
            f"schema mismatch: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        ), n
    if len(spark_pdf) != len(oracle_pdf):
        return False, (
            f"rowcount mismatch: spark={n} oracle={len(oracle_pdf)}"
        ), n
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:3]
        return False, f"value mismatch, first diffs: {diffs}", n
    return True, f"ok ({n} rows)", n


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from aind_exaspim_data_transformation_spark.queries import ORACLES, QUERIES
    from aind_exaspim_data_transformation_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark(
        "parity-check",
        cpus=int(os.environ.get("SPARK_GRAFT_PARITY_CPUS", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    failed = []
    records: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            if name not in ORACLES:
                n = df.count()
                print(f"  [rows-only] {name}: {n} rows")
                records[name] = {
                    "ok": True,
                    "rows": n,
                    "oracle": False,
                    "msg": "rows-only (no oracle registered)",
                    "err": None,
                }
                continue
            ok, msg, n_rows = compare(df, ORACLES[name], sf_dir)
            status = "PASS" if ok else "FAIL"
            print(f"  [{status}] {name}: {msg}")
            records[name] = {
                "ok": ok,
                "rows": n_rows,
                "oracle": True,
                "msg": msg,
                "err": None,
            }
            if not ok:
                failed.append(name)
        except Exception as exc:
            print(f"  [ERROR] {name}:")
            traceback.print_exc()
            records[name] = {
                "ok": False,
                "rows": None,
                "oracle": name in ORACLES,
                "msg": None,
                "err": f"{type(exc).__name__}: {exc}",
            }
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", failed)
    # Full-sweep artifact (round-11 verdict, Next #5): the driver's
    # CORRECTNESS file samples 50 rows per round; PARITY_JSON_OUT
    # commits the whole-registry sweep in a comparable per-query
    # schema so coverage beyond the sample is auditable in-repo.
    out = os.environ.get("PARITY_JSON_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(
                {
                    "summary": {
                        "sf_dir": sf_dir,
                        "passed": len(names) - len(failed),
                        "total": len(names),
                        "failed": failed,
                        "generated_by": (
                            "tools/parity.py (driver-identical compare:"
                            " row count + sorted column names +"
                            " order-insensitive canonical value rows,"
                            " strict to the ulp)"
                        ),
                    },
                    "queries": records,
                },
                f,
                indent=1,
            )
        print(f"wrote {out}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
