"""Continuous tile ingestion: a Structured Streaming conversion mode.

A manifest directory is watched as a file stream (one ``*.manifest``
text file per arriving tile, containing ``<source_path>``); every
micro-batch converts its new tiles through the SAME multi-tile shard
pipeline via ``foreachBatch``. This is the streaming twin of
``job.run_job``: ingestion keeps up with acquisition instead of running
as a nightly batch, with exactly-once effect thanks to idempotent shard
writes + the streaming checkpoint.

At scale: the stream only carries manifest rows (paths); each batch's
conversion is a full cluster-parallel job over coordinates-only tasks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..config import ConvertJobSettings
from ..job import _tile_store
from ..zarrio.multitile import convert_tiles_to_zarr


def watch_manifests(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """Stream of tile source paths from ``*.manifest`` files."""
    return (
        spark.readStream.format("text")
        .option("pathGlobFilter", "*.manifest")
        .load(manifest_dir)
        .withColumnRenamed("value", "tile_path")
    )


def run_ingest(
    spark: SparkSession,
    manifest_dir: str,
    output_root: str,
    settings: ConvertJobSettings,
    checkpoint_dir: str | None = None,
) -> list[dict]:
    """Drain currently-available manifests (availableNow) converting each
    batch of tiles; returns per-batch stats. A production deployment
    drops availableNow for a continuous trigger."""
    results: list[dict] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # _tile_store keeps the naming identical to the batch job, so a
        # backfill-then-stream deployment converges on one store per tile.
        tiles = [
            (
                r["tile_path"].strip(),
                _tile_store(
                    output_root, os.path.basename(r["tile_path"].strip())
                ),
            )
            for r in batch_df.collect()
            if r["tile_path"].strip()
        ]
        if tiles:
            results.append(convert_tiles_to_zarr(spark, tiles, settings))

    q = (
        watch_manifests(spark, manifest_dir)
        .writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{output_root}_ingest_checkpoint",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return results
