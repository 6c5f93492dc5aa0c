"""SF-scaling sweep: per-query Spark wall time + DuckDB oracle check at
an arbitrary SF directory — the evidence run for "would this plan hold
at 100x" (round-5/6 verdict item: sf10 sweep of the shuffle-heavy set).

    python tools/gen_testdata.py --sf 10 --out .localdata/sf10
    python tools/scale_sweep.py .localdata/sf10            # default set
    python tools/scale_sweep.py <sf_dir> q01_pricing_summary ...

Prints one line per query (seconds, rows, oracle verdict) and a final
JSON summary line for the round notes. Timing covers plan build +
execution + result collection (results are aggregates — tiny next to
execution), on local[$SPARK_GRAFT_SWEEP_CPUS] (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity import compare  # noqa: E402  (sibling tools/ module)

# The shuffle-heavy set: every query whose plan contains a fact-fact
# join, a wide aggregation, a window over a big partition, a pair
# generator, or an iterative/recursive step — the ones whose cost could
# scale super-linearly if a cap/checkpoint/broadcast were wrong.
SHUFFLE_HEAVY = [
    # TPC-H 22 (Q7 == q_nation_pair_volume)
    "q01_pricing_summary", "q02_min_cost_supplier",
    "q03_shipping_priority", "q04_order_priority",
    "q05_local_supplier_volume", "q06_forecast_revenue",
    "q_nation_pair_volume", "q08_market_share", "q09_nation_profit",
    "q10_returned_items", "q11_important_stock", "q12_late_shipments",
    "q13_customer_distribution", "q14_promotion_effect",
    "q15_top_supplier", "q16_part_variety",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q19_discounted_revenue", "q20_dominant_suppliers",
    "q21_waiting_suppliers", "q22_sales_opportunity",
    # dedup family (incl. the round-6 capped n-gram + checkpointed CC)
    "q_dedup_exact", "q_dedup_by_key", "q_minhash_signatures",
    "q_minhash_lsh_pairs", "q_minhash_lsh_pairs_capped",
    "q_ngram_jaccard_pairs", "q_dedup_clusters",
    "q_dedup_keep_canonical", "q_simhash",
    # ANN / embeddings
    "q_knn_bruteforce", "q_ann_lsh", "q_ann_ivf", "q_ann_pq",
    "q_kmeans_embeddings", "q_embedding_near_dup_pairs",
    # behavioral analytics
    "q_events_funnel", "q_events_retention_cohort", "q_events_gapfill",
    "q_events_rolling_24h", "q_hll_sketch_union",
    # training-data assembly
    "q_docs_temperature_sample", "q_docs_pack_sequences",
    "q_docs_pack_sequences_bpe",  # r11: real-token packing twin
    "q_docs_training_pipeline", "q_docs_stratified_sample",
    # multimodal codecs/operators (map-only by design — swept to prove
    # the per-row codec cost stays linear and payloads never shuffle)
    "q_multimodal_image_decode_stats", "q_multimodal_audio_decode_stats",
    "q_multimodal_jpeg_decode_stats",
    "q_multimodal_jpeg_progressive_stats", "q_multimodal_mp4_meta",
    "q_multimodal_mp4_demux",
    "q_multimodal_frame_sample", "q_multimodal_image_features",
    "q_multimodal_audio_features",
]


# Round 8 closed the sf10 oracle gap: the cluster oracles' k^2
# recursive closure became iterative min-label propagation + pointer
# doubling (V + E rows per round), and the ANN oracles' per-dimension
# embeddings-x-planes explode (512M grouped rows at sf10) became
# index-ordered list kernels over pre-aggregated plane lists — all
# verified bit-identical at sf0.01-sf1. SWEEP_SKIP_ORACLE remains as an
# escape hatch for ad-hoc runs; since round 12 the built-in set has
# exactly ONE member (below), by design rather than by gap.
ORACLE_INFEASIBLE_AT_SCALE: set[str] = set()
# Round 12 re-opens the set for exactly one row, by design rather than
# by gap: q_text_bpe32k_tokens' oracle is the exact 32,768-step replace
# fold — O(vocab x corpus), affordable at the sf0.01 driver gate,
# quadratic-in-vocab at sweep SF, while the ENGINE side is the
# linear-time heap encoder (that asymmetry is the point of the query).
# Sweep-scale exactness for the 32k path is carried instead by
# q_text_bpe32k_roundtrip (md5 detokenize-identity, cheap at any SF)
# and q_text_bpe32k_prefix512 (fold oracle over 512 ranks, the same
# cost class as the sf30-proven 256-merge fold).
ORACLE_INFEASIBLE_AT_SCALE.add("q_text_bpe32k_tokens")
ORACLE_INFEASIBLE_AT_SCALE.add("q_docs_pack_sequences_bpe32k")
ORACLE_INFEASIBLE_AT_SCALE.add("q_docs_training_pipeline_bpe32k")
ORACLE_INFEASIBLE_AT_SCALE |= {
    n for n in os.environ.get("SWEEP_SKIP_ORACLE", "").split(",") if n
}


def _io_probe_ms(size_mb: int = 64) -> float:
    """Write+fsync probe on the shuffle-spill/temp disk (round 12): the
    matmul probe is CPU-only, and the shuffle-heavy rows (HLL's distinct
    dedup, big-join spills) swing 3-6x at FIXED data with CLEAN cpu
    probes — the contention lives on the shared disk. 64 MB keeps the
    cost ~0.3 s/row against multi-second rows."""
    import tempfile

    buf = os.urandom(1 << 20)
    t0 = time.monotonic()
    fd, path = tempfile.mkstemp(prefix="sweep_io_probe_")
    try:
        with os.fdopen(fd, "wb") as f:
            for _ in range(size_mb):
                f.write(buf)
            f.flush()
            os.fsync(f.fileno())
    finally:
        os.unlink(path)
    return round((time.monotonic() - t0) * 1000, 1)


def _quick_probe_ms() -> float:
    """Instantaneous host-speed reading recorded PER ROW (round 11):
    this VM's effective CPU speed swings up to ~5x with hypervisor
    neighbor load (measured: the bench matmul probe reading 27 ms and
    111 ms minutes apart on an idle guest, loadavg 24 with vmstat 100%
    idle), so a single warmup-time probe cannot certify a whole sweep.
    A drifted row whose probe also drifted is a host window, not a plan
    regression; a slow row with a clean probe is real. ~50 ms cost per
    row — noise next to multi-second queries."""
    import numpy as np

    x = np.random.rand(1200, 1200)
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        x @ x
        best = min(best, time.monotonic() - t0)
    return round(best * 1000, 1)


def _sf_of(sf_dir: str) -> float | None:
    """Parse the scale factor out of a .../sfN[.N] directory name."""
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)/?$", sf_dir.rstrip("/"))
    return float(m.group(1)) if m else None


def _input_bytes(sf_dir: str) -> int:
    return sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )


def main() -> int:
    from aind_exaspim_data_transformation_spark.queries import (
        ORACLES,
        QUERIES,
    )
    from aind_exaspim_data_transformation_spark.queries.registry import (
        SCALE_LIMITS,
    )
    from aind_exaspim_data_transformation_spark.session import get_spark
    from aind_exaspim_data_transformation_spark.sources.tables import (
        load_table,
    )

    sf_dir = sys.argv[1]
    names = sys.argv[2:] or SHUFFLE_HEAVY
    check_oracle = os.environ.get("SWEEP_ORACLE", "1") != "0"
    oracle_all = os.environ.get("SWEEP_ORACLE_ALL", "0") == "1"
    # QUERY-level infeasibility guard (round-10 verdict, What's wrong
    # #3): rows tagged scale_infeasible_above_sf in the registry are
    # skipped BY POLICY above their declared SF — a known-unbounded row
    # must not be rediscovered by filling the disk. Override (to
    # demonstrate the failure mode deliberately, with your own
    # disk/timeout guard): SWEEP_FORCE_INFEASIBLE=1.
    sf = _sf_of(sf_dir)
    force_infeasible = os.environ.get("SWEEP_FORCE_INFEASIBLE", "0") == "1"
    # local[32] shares ONE heap across all 32 executor threads, so the
    # 8g session default is 0.25 GB/core — an order of magnitude below
    # any production executor (2-8 GB/core). At sf30 the uncapped-LSH
    # contrast row OOMs that heap; give the sweep JVM 1.5 GB/core
    # unless the caller already chose a size.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    in_bytes = _input_bytes(sf_dir)
    spark = get_spark(
        "scale-sweep",
        cpus=int(os.environ.get("SPARK_GRAFT_SWEEP_CPUS", "32")),
        # The sweep collects every query's full result (driver-side
        # hash protocol); row-per-sample queries (mp4 demux: ~20M rows
        # at sf30) pass 1 GiB of Arrow batches, over the 1g default.
        extra_conf={"spark.driver.maxResultSize": "8g"},
        # Initial shuffle partitions sized from the input (sf30
        # finding: q09 18.9 s at 32 partitions -> 13.8 s at 128; AQE
        # only coalesces down, so the initial number must scale up).
        target_input_bytes=in_bytes,
    )
    spark.sparkContext.setLogLevel("ERROR")
    shuffle_parts = spark.conf.get("spark.sql.shuffle.partitions")

    # Warm-up + environment snapshot (round-10 protocol fix): the first
    # timed query otherwise absorbs Python-worker spin-up, Arrow
    # serializer init, AND the host's slow CPU power state (bench.py's
    # cpu probe both measures and clears it) — q01 measured 337 s cold
    # vs ~8 s warm at sf30. The warm-up is QUERY-NEUTRAL (round-10
    # advice): a full-scan hash aggregate over every table warms the
    # page cache for all queries equally, instead of running one member
    # of the timed set (q06 previously self-warmed its own plan and its
    # lineitem scan pattern); one pandas round trip spins up the Python
    # workers.
    from pyspark.sql import functions as F

    from bench import _env_snapshot  # repo-root module, on sys.path

    env = _env_snapshot()
    for f in sorted(os.listdir(sf_dir)):
        if f.endswith(".parquet"):
            t = load_table(spark, sf_dir, f[: -len(".parquet")])
            # max (not sum): sum of int64 hashes overflows under ANSI
            t.select(
                F.max(F.xxhash64(*t.columns)).alias("h")
            ).collect()
    spark.range(32, numPartitions=32).mapInPandas(
        lambda it: it, "id long"
    ).collect()  # spin up one Python worker per core
    # JIT warm-up for decimal-aggregate infrastructure (round 11): the
    # first decimal-sum query in a fresh JVM pays C2 compilation of the
    # shared Decimal/UnsafeRow/hash-agg machinery — measured 38-60 s on
    # q01 at sf10 after only the scan-hash warm-up above, vs 7 s when
    # any decimal aggregate ran first. Whole-stage codegen is compiled
    # PER PLAN, so every timed query still compiles (and JITs) its own
    # generated class; what this warms is the JVM-level substrate all
    # decimal aggregates share. Deliberately NOT a registry query, and
    # shaped unlike any timed row (different group key and aggregate
    # mix) so no single query's plan gets preferential treatment.
    li = load_table(spark, sf_dir, "lineitem")
    li.where(F.col("l_orderkey") % 3 == 0).groupBy("l_linenumber").agg(
        F.sum(
            F.col("l_extendedprice") * (F.col("l_tax") - F.lit(0.5))
        ).alias("s"),
        F.avg(F.col("l_discount") * F.col("l_quantity")).alias("a"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    print(
        f"warmup done; shuffle_partitions={shuffle_parts} "
        f"input_gb={in_bytes / 1e9:.1f} env={json.dumps(env)}",
        flush=True,
    )

    # Multi-pass timing (round 11): this host's effective CPU/IO speed
    # swings up to ~5x with hypervisor neighbor load on a minutes
    # timescale (per-row probes in one sweep read 13.5 ms and 107 ms),
    # so any single-pass wall time can be a window artifact. Each pass
    # re-times every row; a row's headline `sec` is the MIN over
    # passes (same rationale as bench.py's min-of-mins), with all
    # samples and their host-speed probes recorded so a reader can see
    # which windows were dirty. Oracle checks run on pass 1 only.
    passes = int(os.environ.get("SWEEP_PASSES", "2"))
    rows: dict[str, dict] = {}
    failed = []
    skipped = []
    for pass_i in range(passes):
        if passes > 1:
            print(f"-- timing pass {pass_i + 1}/{passes}", flush=True)
        for name in names:
            limit = SCALE_LIMITS.get(name)
            if (
                limit is not None
                and sf is not None
                and sf > limit[0]
                and not force_infeasible
            ):
                if pass_i == 0:
                    print(
                        f"  {name:34s} SKIP (scale_infeasible_above_sf="
                        f"{limit[0]:g}: {limit[1]})",
                        flush=True,
                    )
                    rows[name] = {
                        "sec": None,
                        "rows": None,
                        "ok": None,
                        "skipped": (
                            f"scale_infeasible_above_sf={limit[0]:g}"
                        ),
                        "reason": limit[1],
                    }
                    skipped.append(name)
                continue
            if name in failed:
                continue
            try:
                probe_ms = _quick_probe_ms()
                io_ms = _io_probe_ms()
                t0 = time.monotonic()
                df = QUERIES[name](spark, sf_dir)
                pdf = df.toPandas()
                dt = time.monotonic() - t0
                skip_oracle = (
                    name in ORACLE_INFEASIBLE_AT_SCALE and not oracle_all
                )
                if pass_i > 0:
                    ok = rows[name]["ok"]
                    status = "retimed"
                elif check_oracle and name in ORACLES and not skip_oracle:
                    ok, msg, _n = compare(
                        df, ORACLES[name], sf_dir, spark_pdf=pdf
                    )
                    status = "PASS" if ok else f"FAIL {msg}"
                else:
                    ok = True
                    status = (
                        "rows-only (oracle infeasible at this SF)"
                        if skip_oracle
                        else "rows-only"
                    )
                print(
                    f"  {name:34s} {dt:8.2f}s  rows={len(pdf):>8}  "
                    f"probe={probe_ms:5.1f}ms io={io_ms:6.1f}ms  {status}",
                    flush=True,
                )
                r = rows.setdefault(
                    name, {"rows": len(pdf), "secs": [], "probes_ms": []}
                )
                r.setdefault("secs", []).append(round(dt, 2))
                r.setdefault("probes_ms", []).append(probe_ms)
                r.setdefault("io_probes_ms", []).append(io_ms)
                r["sec"] = min(r["secs"])
                r["ok"] = ok
                if not ok and name not in failed:
                    failed.append(name)
            except Exception:
                print(f"  [ERROR] {name}:", flush=True)
                traceback.print_exc()
                # Keep any earlier pass's valid samples AND verdict — a
                # transient failure on a retime pass must not erase an
                # oracle-verified pass-1 result (the assembler ANDs
                # `ok` over runs); only a pass-1 failure marks the row
                # failed / ok=False.
                r = rows.setdefault(name, {"sec": None, "rows": None})
                if pass_i == 0 or "ok" not in r:
                    r["ok"] = False
                    if name not in failed:
                        failed.append(name)
                r.setdefault("pass_errors", []).append(pass_i + 1)
    ran = len(names) - len(failed) - len(skipped)
    print(f"\n{ran}/{len(names) - len(skipped)} passed", end="")
    print(f" ({len(skipped)} skipped by scale policy)" if skipped else "")
    if failed:
        print("failed:", failed)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "sf": sf,
                "queries": rows,
                "env": env,
                "shuffle_partitions": shuffle_parts,
                "input_bytes": in_bytes,
                "skipped_by_policy": skipped,
                "passes": passes,
                "protocol": (
                    "per-row sec = min over timing passes; probes_ms ="
                    " host matmul speed right before each sample (clean"
                    " ~14 ms; hypervisor-neighbor slow windows 50-110 ms);"
                    " io_probes_ms = 64MB write+fsync on the spill disk"
                    " per sample (clean ~200-400 ms; a drifted io probe"
                    " with a clean cpu probe names a dirty disk window)"
                ),
            }
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
