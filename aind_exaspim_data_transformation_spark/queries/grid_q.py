"""Tensor/shard grid planning as DataFrame expressions (SURVEY §2A: E1, E2,
S9, A1, G2).

The reference enumerates shard tasks with imperative Python loops
(compute_shard_grid / shard_index_to_slices / enumerate_shard_indices,
reference compress/imaris_to_zarr.py:277-372); here the grid IS a DataFrame
produced by ``sequence`` + ``explode`` — Catalyst prunes and parallelizes
it like any other relation. Inline tile specs carry the reference's own
golden cases: shape (768, 2688, 3584) with shard 256 -> grid (3, 11, 14),
and truncated edge blocks on non-divisible shapes.

These queries run on inline literals (no parquet input) so the DuckDB
oracle can verify the planner math itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query

# (tile_id, shape_z, shape_y, shape_x, shard)
_TILES = [
    (0, 768, 2688, 3584, 256),  # golden: grid (3, 11, 14), 462 shards
    (1, 100, 200, 300, 64),  # non-divisible: truncated edges
    (2, 50, 50, 50, 32),  # 2^3 grid with (18,18,18) tail blocks
]

_TILE_VALUES = ", ".join(f"({t[0]}, {t[1]}, {t[2]}, {t[3]}, {t[4]})" for t in _TILES)


def _tiles_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _TILES,
        "tile_id int, shape_z int, shape_y int, shape_x int, shard int",
    )


# --------------------------------------------------------------------------
# E1: shard grid enumeration with boundary clamp (row-major z, y, x).
# --------------------------------------------------------------------------
@query(
    "q_shard_grid",
    oracle=f"""
WITH tiles(tile_id, shape_z, shape_y, shape_x, shard) AS (
  VALUES {_TILE_VALUES}),
gz AS (
  SELECT *, unnest(range(0, (shape_z + shard - 1) // shard)) AS iz FROM tiles),
gy AS (
  SELECT *, unnest(range(0, (shape_y + shard - 1) // shard)) AS iy FROM gz),
gx AS (
  SELECT *, unnest(range(0, (shape_x + shard - 1) // shard)) AS ix FROM gy)
SELECT tile_id, iz, iy, ix,
  iz * shard AS z0, least((iz + 1) * shard, shape_z) AS z1,
  iy * shard AS y0, least((iy + 1) * shard, shape_y) AS y1,
  ix * shard AS x0, least((ix + 1) * shard, shape_x) AS x1,
  (least((iz + 1) * shard, shape_z) - iz * shard)
    * (least((iy + 1) * shard, shape_y) - iy * shard)
    * (least((ix + 1) * shard, shape_x) - ix * shard) AS n_voxels
FROM gx
""",
)
def q_shard_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiles = _tiles_df(spark)
    grid_dim = lambda d: (F.col(d) + F.col("shard") - 1).cast("long") / F.col(
        "shard"
    )
    g = (
        tiles.withColumn(
            "iz",
            F.explode(
                F.sequence(F.lit(0).cast("long"), grid_dim("shape_z").cast("long") - 1)
            ),
        )
        .withColumn(
            "iy",
            F.explode(
                F.sequence(F.lit(0).cast("long"), grid_dim("shape_y").cast("long") - 1)
            ),
        )
        .withColumn(
            "ix",
            F.explode(
                F.sequence(F.lit(0).cast("long"), grid_dim("shape_x").cast("long") - 1)
            ),
        )
    )
    z1 = F.least((F.col("iz") + 1) * F.col("shard"), F.col("shape_z"))
    y1 = F.least((F.col("iy") + 1) * F.col("shard"), F.col("shape_y"))
    x1 = F.least((F.col("ix") + 1) * F.col("shard"), F.col("shape_x"))
    return g.select(
        "tile_id",
        "iz",
        "iy",
        "ix",
        (F.col("iz") * F.col("shard")).alias("z0"),
        z1.alias("z1"),
        (F.col("iy") * F.col("shard")).alias("y0"),
        y1.alias("y1"),
        (F.col("ix") * F.col("shard")).alias("x0"),
        x1.alias("x1"),
        (
            (z1 - F.col("iz") * F.col("shard"))
            * (y1 - F.col("iy") * F.col("shard"))
            * (x1 - F.col("ix") * F.col("shard"))
        ).alias("n_voxels"),
    )


# --------------------------------------------------------------------------
# E2: downsampled shapes per pyramid level (ceil division, levels 0..4).
# --------------------------------------------------------------------------
@query(
    "q_downsample_shapes",
    oracle=f"""
WITH tiles(tile_id, shape_z, shape_y, shape_x, shard) AS (
  VALUES {_TILE_VALUES}),
lv AS (SELECT *, unnest(range(0, 5)) AS level FROM tiles),
f AS (SELECT tile_id, level, CAST(power(2, level) AS BIGINT) AS factor,
             shape_z, shape_y, shape_x FROM lv)
SELECT tile_id, level,
  (shape_z + factor - 1) // factor AS lvl_z,
  (shape_y + factor - 1) // factor AS lvl_y,
  (shape_x + factor - 1) // factor AS lvl_x
FROM f
""",
)
def q_downsample_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiles = _tiles_df(spark)
    lv = tiles.withColumn(
        "level", F.explode(F.sequence(F.lit(0), F.lit(4)))
    ).withColumn("factor", F.pow(F.lit(2.0), F.col("level")).cast("long"))
    ceil_div = lambda d: (F.col(d) + F.col("factor") - 1).cast("long") / F.col(
        "factor"
    )
    return lv.select(
        "tile_id",
        "level",
        ceil_div("shape_z").cast("long").alias("lvl_z"),
        ceil_div("shape_y").cast("long").alias("lvl_y"),
        ceil_div("shape_x").cast("long").alias("lvl_x"),
    )


# --------------------------------------------------------------------------
# S9: superchunk coalescing plan — group shard grid into 2x-per-axis
# superchunks and count shards served per superchunk read.
# --------------------------------------------------------------------------
@query(
    "q_superchunk_plan",
    oracle=f"""
WITH tiles(tile_id, shape_z, shape_y, shape_x, shard) AS (
  VALUES {_TILE_VALUES}),
gz AS (
  SELECT *, unnest(range(0, (shape_z + shard - 1) // shard)) AS iz FROM tiles),
gy AS (
  SELECT *, unnest(range(0, (shape_y + shard - 1) // shard)) AS iy FROM gz),
gx AS (
  SELECT *, unnest(range(0, (shape_x + shard - 1) // shard)) AS ix FROM gy)
SELECT tile_id, iz // 2 AS sc_z, iy // 2 AS sc_y, ix // 2 AS sc_x,
  COUNT(*) AS shards_per_superchunk
FROM gx
GROUP BY tile_id, iz // 2, iy // 2, ix // 2
""",
)
def q_superchunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = q_shard_grid(spark, sf_dir)
    return grid.groupBy(
        "tile_id",
        (F.col("iz") / 2).cast("long").alias("sc_z"),
        (F.col("iy") / 2).cast("long").alias("sc_y"),
        (F.col("ix") / 2).cast("long").alias("sc_x"),
    ).agg(F.count(F.lit(1)).alias("shards_per_superchunk"))


# --------------------------------------------------------------------------
# A1: the six downsample aggregation modes over an inline 4x4x4 voxel cube,
# factor (2,2,2). Value design gives every 2x2x2 window a unique mode:
# val = base + (0 at the window origin, else 1), base = 100z'+10y'+x'.
# --------------------------------------------------------------------------
@query(
    "q_downsample_modes",
    oracle="""
WITH z AS (SELECT unnest(range(0, 4)) AS z),
v AS (
  SELECT z.z, y.y, x.x,
    CAST(floor(z.z / 2.0) * 100 + floor(y.y / 2.0) * 10 + floor(x.x / 2.0)
      + CASE WHEN z.z % 2 = 0 AND y.y % 2 = 0 AND x.x % 2 = 0
             THEN 0 ELSE 1 END AS BIGINT) AS val
  FROM z
  CROSS JOIN (SELECT unnest(range(0, 4)) AS y) y
  CROSS JOIN (SELECT unnest(range(0, 4)) AS x) x)
SELECT CAST(floor(z / 2.0) AS BIGINT) AS pz,
       CAST(floor(y / 2.0) AS BIGINT) AS py,
       CAST(floor(x / 2.0) AS BIGINT) AS px,
  CAST(SUM(val) AS DOUBLE) / COUNT(*) AS ds_mean,
  MIN(val) AS ds_min,
  MAX(val) AS ds_max,
  CAST(median(val) AS DOUBLE) AS ds_median,
  mode(val) AS ds_mode,
  MIN(CASE WHEN z % 2 = 0 AND y % 2 = 0 AND x % 2 = 0 THEN val END)
    AS ds_stride
FROM v
GROUP BY 1, 2, 3
""",
)
def q_downsample_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    axis = lambda name: F.explode(F.sequence(F.lit(0), F.lit(3))).alias(name)
    z = spark.range(1).select(axis("z"))
    cube = z.select("z", axis("y")).select("z", "y", axis("x"))
    origin = (
        (F.col("z") % 2 == 0) & (F.col("y") % 2 == 0) & (F.col("x") % 2 == 0)
    )
    val = (
        F.floor(F.col("z") / 2) * 100
        + F.floor(F.col("y") / 2) * 10
        + F.floor(F.col("x") / 2)
        + F.when(origin, 0).otherwise(1)
    ).cast("long")
    v = cube.withColumn("val", val)
    return v.groupBy(
        F.floor(F.col("z") / 2).alias("pz"),
        F.floor(F.col("y") / 2).alias("py"),
        F.floor(F.col("x") / 2).alias("px"),
    ).agg(
        (F.sum("val").cast("double") / F.count(F.lit(1))).alias("ds_mean"),
        F.min("val").alias("ds_min"),
        F.max("val").alias("ds_max"),
        F.median("val").cast("double").alias("ds_median"),
        F.mode("val").alias("ds_mode"),
        F.min(
            F.when(
                (F.col("z") % 2 == 0)
                & (F.col("y") % 2 == 0)
                & (F.col("x") % 2 == 0),
                F.col("val"),
            )
        ).alias("ds_stride"),
    )


# --------------------------------------------------------------------------
# G2: OME-NGFF per-level origin/translation chain. Golden values from the
# reference's translation-fix test: [0, 0.5, 1.5, 3.5, 7.5] for factor 2,
# voxel 1.0 (reference tests/test_translation_fix.py:88-94). Closed form
# for factor 2: translation_k = (2^k - 1) / 2 * voxel0.
# --------------------------------------------------------------------------
@query(
    "q_origin_downscale",
    oracle="""
SELECT level,
  power(2.0, level) AS voxel_size,
  (power(2.0, level) - 1) / 2.0 AS translation
FROM (SELECT unnest(range(0, 5)) AS level)
""",
)
def q_origin_downscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    lv = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("level")
    )
    return lv.select(
        "level",
        F.pow(F.lit(2.0), F.col("level")).alias("voxel_size"),
        ((F.pow(F.lit(2.0), F.col("level")) - 1) / 2.0).alias("translation"),
    )


# --------------------------------------------------------------------------
# Z-order (Morton) curve key, SQL-visible: interleave the low 4 bits of
# two join-key residues. Both engines evaluate the identical shift/mask
# integer arithmetic (operators/layout.py::morton_key is the engine
# primitive; write_zordered uses it for data-skipping layout).
# --------------------------------------------------------------------------
def _morton_sql_terms(xcol: str, ycol: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({xcol} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({ycol} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@query(
    "q_zorder_curve",
    oracle=f"""
WITH keys AS (
  SELECT l_orderkey, l_linenumber,
    l_partkey % 16 AS x, l_suppkey % 16 AS y
  FROM lineitem WHERE l_orderkey < 2000)
SELECT l_orderkey, l_linenumber,
  CAST({_morton_sql_terms('x', 'y', 4)} AS BIGINT) AS zkey
FROM keys
""",
)
def q_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import morton_key
    from ..sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") < 2000
    )
    x = F.pmod(F.col("l_partkey"), F.lit(16))
    y = F.pmod(F.col("l_suppkey"), F.lit(16))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        morton_key([x, y], bits=4).alias("zkey"),
    )
