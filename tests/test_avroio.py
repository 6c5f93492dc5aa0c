"""From-spec Avro container codec + pyavro DataSource.

Spec-conformance goldens (zigzag/varint values straight from the Avro
1.12 spec's Binary Encoding section), container roundtrips across
codecs and types, deterministic re-write bytes, and the Catalyst-level
read/write path.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from aind_exaspim_data_transformation_spark.sources.avroio import (
    MAGIC,
    read_container,
    read_header,
    read_long,
    write_container,
    write_long,
    zigzag_decode,
    zigzag_encode,
)

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "x", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "flag", "type": "boolean"},
        {"name": "maybe", "type": ["null", "int"]},
    ],
}

ROWS = [
    (0, 0.0, "", b"", False, None),
    (1, -1.5, "héllo wörld", b"\x00\xff", True, 42),
    (-(2**62), 1e300, "x" * 1000, bytes(range(256)), True, -1),
    (2**62, float("inf"), "tab\there", b"sync", False, None),
]


def test_zigzag_spec_goldens():
    # Values straight from the Avro spec's varint/zigzag table.
    assert zigzag_encode(0) == 0
    assert zigzag_encode(-1) == 1
    assert zigzag_encode(1) == 2
    assert zigzag_encode(-2) == 3
    assert zigzag_encode(2) == 4
    for n in (0, -1, 1, 63, -64, 64, 2**40, -(2**40), 2**62):
        assert zigzag_decode(zigzag_encode(n)) == n


def test_varint_spec_goldens():
    # Spec: 64 encodes as 0x80 0x01 (zigzag 128, 7-bit little-endian).
    out = bytearray()
    write_long(out, 64)
    assert bytes(out) == b"\x80\x01"
    out = bytearray()
    write_long(out, -64)
    assert bytes(out) == b"\x7f"
    for n in (0, 1, -1, 127, 128, -(2**35), 2**35):
        buf = bytearray()
        write_long(buf, n)
        got, pos = read_long(bytes(buf), 0)
        assert (got, pos) == (n, len(buf))


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    n = write_container(p, SCHEMA, ROWS, codec=codec)
    assert n == len(ROWS)
    with open(p, "rb") as f:
        assert f.read(4) == MAGIC
    schema, got_codec, sync, _ = read_header(p)
    assert got_codec == codec
    assert len(sync) == 16
    assert [f["name"] for f in schema["fields"]] == [
        "id",
        "x",
        "s",
        "b",
        "flag",
        "maybe",
    ]
    assert list(read_container(p)) == ROWS


def test_multi_block_roundtrip(tmp_path):
    p = str(tmp_path / "m.avro")
    rows = [(i, float(i) / 3, f"s{i}", b"", i % 2 == 0, None) for i in range(10000)]
    write_container(p, SCHEMA, rows, block_rows=256)
    assert list(read_container(p)) == rows


def test_deterministic_bytes(tmp_path):
    a, b = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    write_container(a, SCHEMA, ROWS, sync_seed="part-0")
    write_container(b, SCHEMA, ROWS, sync_seed="part-0")
    ha = hashlib.md5(open(a, "rb").read()).hexdigest()
    hb = hashlib.md5(open(b, "rb").read()).hexdigest()
    assert ha == hb  # idempotent-sink invariant


def test_rejects_unsupported():
    with pytest.raises(ValueError):
        write_container(
            "/dev/null",
            {"type": "record", "name": "r", "fields": [
                {"name": "a", "type": {"type": "array", "items": "int"}},
            ]},
            [],
        )
    with pytest.raises(ValueError):
        write_container("/dev/null", SCHEMA, [], codec="snappy")


def test_corrupt_sync_detected(tmp_path):
    p = str(tmp_path / "c.avro")
    write_container(p, SCHEMA, ROWS)
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF  # clobber the trailing sync marker
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="sync"):
        list(read_container(p))


def test_datasource_roundtrip_and_overwrite(spark, tmp_path):
    from pyspark.sql import functions as F

    from aind_exaspim_data_transformation_spark.sources.avro_datasource import (
        AvroDataSource,
    )

    spark.dataSource.register(AvroDataSource)
    out = str(tmp_path / "ds.avro")
    df = spark.range(500).select(
        "id",
        (F.col("id") * 2.5).alias("x"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id").cast("int"))
        .alias("maybe"),
    )
    df.write.format("pyavro").mode("overwrite").save(out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = spark.read.format("pyavro").load(out)
    assert back.schema["maybe"].dataType.typeName() == "integer"
    assert sorted(back.collect(), key=lambda r: r["id"]) == sorted(
        df.collect(), key=lambda r: r["id"]
    )
    # overwrite replaces, never appends
    df.limit(10).write.format("pyavro").mode("overwrite").save(out)
    assert spark.read.format("pyavro").load(out).count() == 10


def test_datasource_honors_user_schema_by_name(spark, tmp_path):
    """A reordered or projected .schema(...) must bind columns by NAME
    against the file header, never by position."""
    from pyspark.sql import functions as F

    from aind_exaspim_data_transformation_spark.sources.avro_datasource import (
        AvroDataSource,
    )

    spark.dataSource.register(AvroDataSource)
    out = str(tmp_path / "reorder.avro")
    df = spark.range(50).select(
        "id",
        (F.col("id") * 1.5).alias("x"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    df.write.format("pyavro").mode("overwrite").save(out)
    # reordered schema: x before id, s dropped
    back = (
        spark.read.format("pyavro")
        .schema("x double, id long")
        .load(out)
        .collect()
    )
    assert all(r["x"] == r["id"] * 1.5 for r in back)
    assert len(back) == 50
    # a field the file does not have -> explicit error, not garbage
    import pytest as _pytest

    with _pytest.raises(Exception, match="lacks requested fields"):
        (
            spark.read.format("pyavro")
            .schema("nope long")
            .load(out)
            .collect()
        )


def test_datasource_append_adds_files(spark, tmp_path):
    """mode('append') must ADD part files — a second job may reuse the
    same partition ids, and clobbering job 1's part-00000 loses data."""
    from aind_exaspim_data_transformation_spark.sources.avro_datasource import (
        AvroDataSource,
    )

    spark.dataSource.register(AvroDataSource)
    out = str(tmp_path / "app.avro")
    df1 = spark.range(0, 100).repartition(2)
    df2 = spark.range(100, 150).repartition(2)
    df1.write.format("pyavro").mode("overwrite").save(out)
    df2.write.format("pyavro").mode("append").save(out)
    back = spark.read.format("pyavro").load(out)
    assert back.count() == 150
    assert set(r["id"] for r in back.collect()) == set(range(150))
    # a third append keeps adding
    spark.range(150, 160).write.format("pyavro").mode("append").save(out)
    assert spark.read.format("pyavro").load(out).count() == 160


def test_datasource_zero_partition_write(spark, tmp_path):
    """An empty 0-partition DataFrame still commits a _SUCCESS marker
    (write() never runs on any executor)."""
    from aind_exaspim_data_transformation_spark.sources.avro_datasource import (
        AvroDataSource,
    )

    spark.dataSource.register(AvroDataSource)
    out = str(tmp_path / "empty.avro")
    df = spark.createDataFrame([], "id long")
    df.write.format("pyavro").mode("overwrite").save(out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_datasource_type_mismatch_rejected(spark, tmp_path):
    """Same-named fields with different Avro types across files must
    raise a descriptive error, not feed mistyped values to Spark."""
    import pytest as _pytest

    from aind_exaspim_data_transformation_spark.sources.avro_datasource import (
        AvroDataSource,
    )

    spark.dataSource.register(AvroDataSource)
    out = str(tmp_path / "mixed.avro")
    os.makedirs(out)
    write_container(
        os.path.join(out, "a.avro"),
        {"type": "record", "name": "r",
         "fields": [{"name": "v", "type": "long"}]},
        [(1,), (2,)],
    )
    write_container(
        os.path.join(out, "b.avro"),
        {"type": "record", "name": "r",
         "fields": [{"name": "v", "type": "string"}]},
        [("x",)],
    )
    with _pytest.raises(Exception, match="expects"):
        spark.read.format("pyavro").schema("v long").load(out).collect()


def test_read_header_probes_not_slurps(tmp_path):
    """read_header must not read the whole container (schema inference
    over big files); offset must still be exactly the data start."""
    p = str(tmp_path / "big.avro")
    rows = [(i, float(i), "s" * 200, b"b" * 200, True, None)
            for i in range(20000)]
    write_container(p, SCHEMA, rows, codec="null")
    schema, codec, sync, pos = read_header(p)
    assert schema["name"] == "row" and codec == "null"
    # header is tiny; data blocks follow immediately
    assert pos < 4096 < os.path.getsize(p)
    assert len(list(read_container(p))) == 20000
