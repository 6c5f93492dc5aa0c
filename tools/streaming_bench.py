"""Streaming ingest throughput (verdict r3 item 7).

Two numbers the correctness tests don't record:

1. Manifest-stream conversion: N tile manifests drained with
   ``availableNow`` + ``maxFilesPerTrigger`` so the run spans several
   micro-batches; reports tiles/s, source GB/s through the shard
   pipeline, and per-batch trigger latency from the streaming progress
   events (the real "can ingestion keep up with acquisition" metric).
2. Events row stream: the watermarked tumbling-window aggregation over
   events.parquet via ``availableNow``; reports rows/s.

Run standalone: ``python tools/streaming_bench.py``
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aind_exaspim_data_transformation_spark.config import ConvertJobSettings
from aind_exaspim_data_transformation_spark.job import _tile_store
from aind_exaspim_data_transformation_spark.session import get_spark
from aind_exaspim_data_transformation_spark.streaming.ingest import (
    watch_manifests,
)
from aind_exaspim_data_transformation_spark.zarrio.multitile import (
    convert_tiles_to_zarr,
)

N_TILES = 8
TILE = "synth://512,512,512,1"  # 268 MB uint16 per tile, 2.1 GB total
FILES_PER_TRIGGER = 2  # -> 4 micro-batches


def bench_manifest_ingest(spark) -> dict:
    results: list[dict] = []
    with tempfile.TemporaryDirectory() as tmp:
        mdir = os.path.join(tmp, "manifests")
        out = os.path.join(tmp, "out")
        os.makedirs(mdir)
        for i in range(N_TILES):
            with open(os.path.join(mdir, f"tile_{i:06d}.manifest"), "w") as f:
                f.write(f"{TILE}\n")
        settings = ConvertJobSettings(
            input_source="stream",
            output_location=out,
            chunk_shape=(64, 64, 64),
            shard_shape=(128, 128, 128),
            translate_pyramid=True,
        )

        def sink(batch_df, batch_id):
            tiles = [
                (
                    r["tile_path"].strip(),
                    _tile_store(
                        out,
                        f"tile_{batch_id}_{i}_"
                        + os.path.basename(r["tile_path"].strip()),
                    ),
                )
                for i, r in enumerate(batch_df.collect())
                if r["tile_path"].strip()
            ]
            if tiles:
                results.append(convert_tiles_to_zarr(spark, tiles, settings))

        t0 = time.monotonic()
        q = (
            spark.readStream.format("text")
            .option("pathGlobFilter", "*.manifest")
            .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
            .load(mdir)
            .withColumnRenamed("value", "tile_path")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.monotonic() - t0
        batch_ms = [
            p["durationMs"]["triggerExecution"]
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
    n_tiles = sum(r["n_tiles"] for r in results)
    gb = sum(r["bytes_read"] for r in results) / 1e9
    return {
        "n_tiles": n_tiles,
        "n_batches": len(batch_ms),
        "wall_seconds": round(wall, 2),
        "tiles_per_sec": round(n_tiles / wall, 3),
        "source_gbps": round(gb / wall, 4),
        "batch_latency_ms": {
            "median": statistics.median(batch_ms) if batch_ms else None,
            "min": min(batch_ms) if batch_ms else None,
            "max": max(batch_ms) if batch_ms else None,
        },
    }


def bench_events_stream(spark, sf_dir: str) -> dict:
    from aind_exaspim_data_transformation_spark.streaming.events import (
        stream_tumbling_counts,
    )

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.monotonic()
        q = (
            stream_tumbling_counts(spark, sf_dir)
            .writeStream.format("memory")
            .queryName("ev_bench")
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.monotonic() - t0
        rows = sum(p.get("numInputRows", 0) for p in q.recentProgress)
    return {
        "input_rows": rows,
        "wall_seconds": round(wall, 2),
        "rows_per_sec": round(rows / wall) if wall else None,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("streaming-bench", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    print(
        json.dumps(
            {
                "manifest_ingest": bench_manifest_ingest(spark),
                "events_stream": bench_events_stream(spark, sf_dir),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
