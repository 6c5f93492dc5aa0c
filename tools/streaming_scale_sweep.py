"""Streaming surface at scale: throughput + state-store growth.

Round-13 verdict Next #4: the q_stream_* rows have oracle parity and
unit tests but had never been scale-swept; ingest throughput and
stateful state growth at sf10 events (10M rows) were unmeasured.

Protocol: the events table is sorted by event time and split into
``--files`` time-ordered parquet chunks (ascending mtimes), then each
streaming operator drains them with ``maxFilesPerTrigger=1`` under
``Trigger.AvailableNow`` — one micro-batch per chunk, so the watermark
advances BETWEEN batches and state eviction actually runs, exactly as
it would on an unbounded stream. Per batch we record numInputRows,
trigger wall, state rows and state memory from StreamingQueryProgress;
per operator we assert the BOUNDED-STATE invariant that makes the plan
viable on an unbounded 100 TB stream:

- watermarked aggregations / dedup / joins: state is O(keys in the
  watermark horizon + one in-flight batch), NOT O(stream length) — the
  last batch's state must not exceed ``state_bound`` and must not grow
  monotonically with batch index once the horizon saturates;
- keyed running aggregates (applyInPandasWithState / TWS): state is
  O(distinct keys), asserted against the key cardinality.

    python tools/streaming_scale_sweep.py .localdata/sf10 --files 10

Emits one JSON document (throughput rows/sec, per-batch state series,
assertion results); exit 1 on any violated bound.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def split_events(sf_dir: str, out_dir: str, n_files: int) -> dict:
    """Sort events by ts and write n_files time-ordered chunks with
    ascending mtimes (the file source processes oldest-first)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev AS SELECT * FROM read_parquet(?) ORDER BY ts,"
        " event_id",
        [os.path.join(sf_dir, "events.parquet")],
    )
    (total,) = con.execute("SELECT count(*) FROM ev").fetchone()
    per = (total + n_files - 1) // n_files
    now = time.time() - n_files * 10
    for i in range(n_files):
        path = os.path.join(out_dir, f"events-{i:03d}.parquet")
        con.execute(
            f"COPY (SELECT * FROM ev ORDER BY ts, event_id"
            f" LIMIT {per} OFFSET {i * per}) TO '{path}'"
            f" (FORMAT PARQUET)"
        )
        os.utime(path, (now + i * 10, now + i * 10))
    con.close()
    return {"rows": total, "files": n_files, "rows_per_file": per}


def drain(df, out_mode: str, tmp: str, name: str):
    """foreachBatch counting sink (memory-format would materialize the
    full output; we only need progress metrics + row counts)."""
    counts = []

    def sink(batch_df, batch_id):
        counts.append(batch_df.count())

    q = (
        df.writeStream.foreachBatch(sink)
        .outputMode(out_mode)
        .option(
            "checkpointLocation", os.path.join(tmp, f"ckpt_{name}")
        )
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.monotonic()
    q.awaitTermination()
    wall = time.monotonic() - t0
    progress = [json.loads(p.json) for p in q.recentProgress]
    return wall, progress, counts


def state_series(progress) -> list[dict]:
    out = []
    for p in progress:
        ops = p.get("stateOperators") or []
        out.append(
            {
                "batch": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "trigger_ms": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
                "state_rows": sum(
                    o.get("numRowsTotal", 0) for o in ops
                ),
                "state_mem_bytes": sum(
                    o.get("memoryUsedBytes", 0) for o in ops
                ),
                "rows_dropped_by_watermark": sum(
                    o.get("numRowsDroppedByWatermark", 0) for o in ops
                ),
            }
        )
    return out


def check_bounded(series, bound, name, failures):
    """Final-batch state under the analytic bound, and no monotone
    growth once the watermark horizon saturates (last batch <= 1.5x the
    max of the middle batches)."""
    rows = [s["state_rows"] for s in series if s["input_rows"]]
    if not rows:
        failures.append((name, "no state series"))
        return {"ok": False}
    final, peak = rows[-1], max(rows)
    mid_peak = max(rows[1:-1]) if len(rows) > 2 else peak
    ok = final <= bound and (
        mid_peak == 0 or final <= 1.5 * mid_peak
    )
    if not ok:
        failures.append((name, f"final={final} bound={bound}"
                               f" mid_peak={mid_peak}"))
    return {"final_state_rows": final, "peak_state_rows": peak,
            "bound": bound, "ok": ok}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--files", type=int, default=10)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip", nargs="*", default=[])
    args = ap.parse_args()

    import duckdb

    con = duckdb.connect()
    (n_users,) = con.execute(
        "SELECT count(DISTINCT user_id) FROM read_parquet(?)",
        [os.path.join(args.sf_dir, "events.parquet")],
    ).fetchone()
    con.close()

    from aind_exaspim_data_transformation_spark.session import get_spark
    from aind_exaspim_data_transformation_spark.streaming import events as ev

    tmp = tempfile.mkdtemp(prefix="stream_sweep_")
    split_dir = os.path.join(tmp, "events_split")
    os.makedirs(split_dir)
    t0 = time.monotonic()
    meta = split_events(args.sf_dir, split_dir, args.files)
    meta["split_sec"] = round(time.monotonic() - t0, 1)
    rows_per_batch = meta["rows_per_file"]

    spark = get_spark("streaming-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def src(**kw):
        return dict(
            spark=spark, sf_dir=split_dir, **kw
        )

    # (name, stream builder, output mode, state bound, bound rationale)
    horizon = int(rows_per_batch * 1.6)
    rows = [
        (
            "stream_tumbling_counts",
            lambda: ev.stream_tumbling_counts(spark, split_dir, max_files_per_trigger=1),
            "update",
            31 * 24 * 5 * 2,
            "windows in 31 days x 5 event types x2 slack — O(horizon),"
            " not O(rows)",
        ),
        (
            # append: session-window aggs reject update mode (sessions
            # only emit once finalized past the watermark).
            "stream_session_windows",
            lambda: ev.stream_session_windows(spark, split_dir, max_files_per_trigger=1),
            "append",
            int(rows_per_batch * 1.2) + n_users,
            "open sessions <= events in one in-flight batch + watermark"
            " tail (sessions finalize once the watermark passes; the"
            " in-flight batch's sessions are all still open state)",
        ),
        (
            "stream_dedup",
            lambda: ev.stream_dedup(spark, split_dir, max_files_per_trigger=1),
            "update",
            horizon + rows_per_batch,
            "keys in 2h watermark horizon + one in-flight batch",
        ),
        (
            "stream_stateful_user_stats",
            lambda: ev.stream_stateful_user_stats(spark, split_dir, max_files_per_trigger=1),
            "update",
            int(n_users * 1.1),
            "running per-user totals: state == distinct users",
        ),
    ]

    results = {}
    failures: list = []
    for name, build, mode, bound, rationale in rows:
        if name in args.skip:
            continue
        wall, progress, counts = drain(build(), mode, tmp, name)
        series = state_series(progress)
        input_rows = sum(s["input_rows"] or 0 for s in series)
        results[name] = {
            "wall_sec": round(wall, 1),
            "input_rows": input_rows,
            "rows_per_sec": round(input_rows / wall),
            "n_batches": len([s for s in series if s["input_rows"]]),
            "output_rows": sum(counts),
            "state_series": series,
            "bounded_state": check_bounded(
                series, bound, name, failures
            ),
            "bound_rationale": rationale,
        }
        print(
            f"# {name}: {results[name]['rows_per_sec']} rows/s,"
            f" final state {results[name]['bounded_state']}",
            file=sys.stderr,
        )

    # TWS (RocksDB provider + protoshim) — separate because of the
    # scoped provider conf.
    if "stream_user_stats_tws" not in args.skip:
        name = "stream_user_stats_tws"
        with ev.tws_state_store(spark):
            wall, progress, counts = drain(
                ev.stream_user_stats_tws(spark, split_dir, max_files_per_trigger=1),
                "update", tmp, name,
            )
        series = state_series(progress)
        input_rows = sum(s["input_rows"] or 0 for s in series)
        results[name] = {
            "wall_sec": round(wall, 1),
            "input_rows": input_rows,
            "rows_per_sec": round(input_rows / wall),
            "n_batches": len([s for s in series if s["input_rows"]]),
            "output_rows": sum(counts),
            "state_series": series,
            "bounded_state": check_bounded(
                series, int(n_users * 1.1), name, failures
            ),
            "bound_rationale": "running per-user totals: state =="
                               " distinct users (RocksDB provider)",
        }
        print(f"# {name}: {results[name]['rows_per_sec']} rows/s",
              file=sys.stderr)

    # foreachBatch parquet ingest: end-to-end sink throughput (the
    # pattern the Zarr streaming sink uses), 2 files per trigger.
    if "foreachbatch_parquet_ingest" not in args.skip:
        name = "foreachbatch_parquet_ingest"
        out_dir = os.path.join(tmp, "ingest_out")
        stream = ev.read_events_stream(
            spark, split_dir, max_files_per_trigger=2
        )
        t0 = time.monotonic()
        n_batches = ev.run_foreach_batch_parquet(stream, out_dir)
        wall = time.monotonic() - t0
        results[name] = {
            "wall_sec": round(wall, 1),
            "input_rows": meta["rows"],
            "rows_per_sec": round(meta["rows"] / wall),
            "n_batches": n_batches,
            "bound_rationale": "stateless sink path — no state store",
        }
        print(f"# {name}: {results[name]['rows_per_sec']} rows/s",
              file=sys.stderr)

    spark.stop()
    if not args.keep:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({
        "sf_dir": args.sf_dir,
        "split": meta,
        "n_users": n_users,
        "protocol": (
            "ts-sorted events split into time-ordered files, one"
            " micro-batch per file (maxFilesPerTrigger=1,"
            " AvailableNow) so watermarks advance between batches and"
            " state eviction runs as on an unbounded stream;"
            " state rows/bytes from StreamingQueryProgress"
            " stateOperators; bounded-state = final batch under the"
            " analytic bound AND <= 1.5x the mid-stream peak."
        ),
        "results": results,
        "failures": [list(f) for f in failures],
    }, indent=1))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
