"""``spark.read.format("zarrshards")`` — a Python DataSource over Zarr v3
sharded stores (the Catalyst-visible reader SURVEY §4 lists as the
optional DataSource V2 ergonomic).

Each input partition is one shard file, so scan parallelism equals the
shard grid and executors read only their shard (the hyperslab-pushdown
property, expressed through the source's natural partitioning). Rows are
block rows per the engine data model (§1.4): coordinates + metadata +
optional payload. With ``payload=false`` (default) the scan is
metadata-only — Catalyst's column pruning then never touches voxel bytes.

Usage::

    spark.dataSource.register(ZarrShardDataSource)
    df = (spark.read.format("zarrshards")
          .option("path", store).option("level", "0")
          .option("payload", "true").load())
"""

from __future__ import annotations

import os
from itertools import product

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _schema(with_payload: bool) -> StructType:
    fields = [
        StructField("level", IntegerType()),
        StructField("iz", IntegerType()),
        StructField("iy", IntegerType()),
        StructField("ix", IntegerType()),
        StructField("z0", IntegerType()),
        StructField("z1", IntegerType()),
        StructField("y0", IntegerType()),
        StructField("y1", IntegerType()),
        StructField("x0", IntegerType()),
        StructField("x1", IntegerType()),
        StructField("dtype", StringType()),
        StructField("file_bytes", LongType()),
    ]
    if with_payload:
        fields.append(StructField("payload", BinaryType()))
    return StructType(fields)


class _ShardPartition(InputPartition):
    """Carries the resolved spec fields so executors never re-read
    zarr.json (a 45k-shard scan would otherwise do 45k metadata reads)."""

    def __init__(
        self,
        store: str,
        level: int,
        idx: tuple[int, ...],
        spec_fields: tuple,
    ):
        self.store = store
        self.level = level
        self.idx = idx
        self.spec_fields = spec_fields


class _ZarrShardReader(DataSourceReader):
    def __init__(self, options: dict):
        self.store = options.get("path")
        if not self.store:
            raise ValueError("zarrshards requires .option('path', <store>)")
        self.level = int(options.get("level", 0))
        self.with_payload = str(options.get("payload", "false")).lower() in (
            "true",
            "1",
        )

    def partitions(self):
        from ..zarrio.format import read_array_metadata

        spec = read_array_metadata(self.store, self.level)
        fields = (
            spec.shape,
            spec.shard_shape,
            spec.chunk_shape,
            spec.dtype,
            spec.codec,
            spec.codec_level,
            spec.fill_value,
            spec.transpose_order,
        )
        return [
            _ShardPartition(self.store, self.level, idx, fields)
            for idx in product(*(range(g) for g in spec.shard_grid))
        ]

    def read(self, partition: _ShardPartition):
        from ..zarrio.format import ShardSpec, decode_shard, shard_path

        shape, shard_shape, chunk_shape, dtype, codec, lvl, fill, tr = (
            partition.spec_fields
        )
        spec = ShardSpec(
            shape=shape,
            shard_shape=shard_shape,
            chunk_shape=chunk_shape,
            dtype=dtype,
            codec=codec,
            codec_level=lvl,
            fill_value=fill,
            transpose_order=tr,
        )
        idx = partition.idx
        path = shard_path(partition.store, partition.level, idx)
        if not os.path.exists(path):
            return
        # spatial dims are the trailing 3 of the 5-D (t,c,z,y,x) layout
        _, _, iz, iy, ix = idx
        sz, sy, sx = spec.shard_shape[2:]
        shape_z, shape_y, shape_x = spec.shape[2:]
        row = [
            partition.level,
            iz,
            iy,
            ix,
            iz * sz,
            min((iz + 1) * sz, shape_z),
            iy * sy,
            min((iy + 1) * sy, shape_y),
            ix * sx,
            min((ix + 1) * sx, shape_x),
            spec.dtype,
            os.path.getsize(path),
        ]
        if self.with_payload:
            with open(path, "rb") as f:
                shard = decode_shard(f.read(), spec)
            # clip padding so payload bytes == logical block bytes
            z1, y1, x1 = row[5] - row[4], row[7] - row[6], row[9] - row[8]
            block = shard[0, 0, :z1, :y1, :x1]
            row.append(bytes(block.tobytes(order="C")))
        yield tuple(row)


class ZarrShardDataSource(DataSource):
    """Block-row scan over a Zarr v3 sharded store."""

    @classmethod
    def name(cls) -> str:
        return "zarrshards"

    def schema(self) -> StructType:
        return _schema(
            str(self.options.get("payload", "false")).lower()
            in ("true", "1")
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _ZarrShardReader(self.options)
