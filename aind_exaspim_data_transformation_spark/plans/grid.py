"""Shard-task planning as DataFrame expressions.

The task list IS a DataFrame: one row per (level, shard index) with
clamped slice bounds — the declarative twin of the reference's
create_shard_tasks/_build_global_shard_task_list loops (reference
compress/imaris_to_zarr.py:465-529, imaris_job.py:535-556). Spark's
scheduler replaces round-robin SPMD partitioning (reference
imaris_job.py:35-46); the superchunk key gives I/O-coalescing
repartitioning (reference utils/io_utils.py:153-207).

Rows carry coordinates only — never voxel payloads — so planning scales
to any grid size (a 6 TB tile at shard 512^3 is ~45k rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_tasks_df(
    spark: SparkSession,
    level_shapes: dict[int, tuple[int, int, int]],
    shard_by_level: dict[int, tuple[int, int, int]],
    superchunk_multiple: tuple[int, int, int] = (2, 1, 1),
) -> DataFrame:
    """One row per (level, iz, iy, ix) with clamped [z0,z1) x [y0,y1) x
    [x0,x1) bounds and a superchunk key for I/O-coalescing repartitioning.
    """
    rows = [
        (
            lvl,
            *level_shapes[lvl],
            *shard_by_level[lvl],
        )
        for lvl in sorted(level_shapes)
    ]
    tiles = spark.createDataFrame(
        rows,
        "level int, shape_z int, shape_y int, shape_x int, "
        "shard_z int, shard_y int, shard_x int",
    )

    def grid(axis: str):
        d, s = F.col(f"shape_{axis}"), F.col(f"shard_{axis}")
        return F.explode(
            F.sequence(F.lit(0), ((d + s - 1).cast("int") / s).cast("int") - 1)
        )

    g = (
        tiles.withColumn("iz", grid("z"))
        .withColumn("iy", grid("y"))
        .withColumn("ix", grid("x"))
    )
    out = g.select(
        "level",
        "iz",
        "iy",
        "ix",
        (F.col("iz") * F.col("shard_z")).alias("z0"),
        F.least((F.col("iz") + 1) * F.col("shard_z"), F.col("shape_z")).alias(
            "z1"
        ),
        (F.col("iy") * F.col("shard_y")).alias("y0"),
        F.least((F.col("iy") + 1) * F.col("shard_y"), F.col("shape_y")).alias(
            "y1"
        ),
        (F.col("ix") * F.col("shard_x")).alias("x0"),
        F.least((F.col("ix") + 1) * F.col("shard_x"), F.col("shape_x")).alias(
            "x1"
        ),
        F.concat_ws(
            ",",
            F.col("level"),
            (F.col("iz") / superchunk_multiple[0]).cast("int"),
            (F.col("iy") / superchunk_multiple[1]).cast("int"),
            (F.col("ix") / superchunk_multiple[2]).cast("int"),
        ).alias("superchunk"),
    )
    return out
