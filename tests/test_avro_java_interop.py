"""Cross-implementation interop: avroio vs the OFFICIAL Apache Avro
Java library (avro-1.12.1.jar, bundled on Spark's classpath).

The from-spec Python codec is only worth anything if real Avro tooling
accepts its files and vice versa — this proves both directions through
py4j: our writer -> Java DataFileReader, Java DataFileWriter -> our
reader. Gated on the jar actually being reachable in the JVM.
"""

from __future__ import annotations

import json
import os

import pytest

from aind_exaspim_data_transformation_spark.sources.avroio import (
    read_container,
    write_container,
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
    (1, 1.5, "héllo wörld", b"\x00\xff\x7f", True, 7),
    (-(2**40), -0.25, "", b"", False, None),
    (2**40, 1e300, "x" * 500, bytes(range(64)), True, -1),
]


@pytest.fixture(scope="module")
def jvm(spark):
    j = spark._jvm
    try:
        j.java.lang.Class.forName("org.apache.avro.file.DataFileReader")
    except Exception:
        pytest.skip("avro jar not on the JVM classpath")
    return j


def test_python_written_file_reads_with_java_avro(spark, jvm, tmp_path):
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"py_{codec}.avro")
        write_container(p, SCHEMA, ROWS, codec=codec)
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(p),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        assert json.loads(reader.getSchema().toString())["fields"] == (
            SCHEMA["fields"]
        )
        got = []
        while reader.hasNext():
            rec = reader.next()
            maybe = rec.get("maybe")
            got.append(
                (
                    rec.get("id"),
                    rec.get("x"),
                    rec.get("s").toString(),
                    bytes(rec.get("b").array()),
                    rec.get("flag"),
                    maybe if maybe is None else int(maybe),
                )
            )
        reader.close()
        assert got == ROWS


def test_java_written_file_reads_with_avroio(spark, jvm, tmp_path):
    p = str(tmp_path / "java.avro")
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema, jvm.java.io.File(p))
    for id_, x, s, b, flag, maybe in ROWS:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", jvm.java.lang.Long.valueOf(id_))
        rec.put("x", float(x))
        rec.put("s", s)
        rec.put("b", jvm.java.nio.ByteBuffer.wrap(bytearray(b)))
        rec.put("flag", bool(flag))
        rec.put(
            "maybe",
            None if maybe is None else jvm.java.lang.Integer.valueOf(maybe),
        )
        writer.append(rec)
    writer.close()
    assert os.path.getsize(p) > 0
    assert list(read_container(p)) == ROWS
