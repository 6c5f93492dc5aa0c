"""``spark.read.format("pyavro")`` / ``df.write.format("pyavro")`` — a
Python DataSource over Avro Object Container Files, backed by the
from-spec codec in ``sources/avroio.py``.

Closes the one mainstream-format gap left by the missing external
``spark-avro`` jar: Avro-resident feeds scan straight into Catalyst
(one input partition per ``.avro`` file, the format's natural split
unit — Avro splits on sync markers, and one-file-per-task is the
degenerate-but-correct split every container writer produces anyway),
and DataFrames write back as standard container files any Avro reader
accepts.

Usage::

    spark.dataSource.register(AvroDataSource)
    df.write.format("pyavro").mode("overwrite").save(path)
    back = spark.read.format("pyavro").load(path)   # schema from files

At 100 TB: the scan parallelism is the file count (Avro lakes are
many-file by construction), pruning/filtering happen in Catalyst above
the source, and the writer emits one container per task with a
deterministic sync marker — idempotent under task retry like every
sink in this repo.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SPARK_TO_AVRO = {
    "long": "long",
    "integer": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "binary": "bytes",
    "boolean": "boolean",
}
_AVRO_TO_SPARK = {
    "long": LongType(),
    "int": IntegerType(),
    "double": DoubleType(),
    "float": FloatType(),
    "string": StringType(),
    "bytes": BinaryType(),
    "boolean": BooleanType(),
}


def spark_schema_to_avro(schema: StructType, name: str = "row") -> dict:
    fields = []
    for f in schema.fields:
        type_name = f.dataType.typeName()
        if type_name not in _SPARK_TO_AVRO:
            raise ValueError(
                f"pyavro: unsupported Spark type {type_name!r} for "
                f"field {f.name!r}"
            )
        avro_t = _SPARK_TO_AVRO[type_name]
        fields.append(
            {
                "name": f.name,
                "type": ["null", avro_t] if f.nullable else avro_t,
            }
        )
    return {"type": "record", "name": name, "fields": fields}


def avro_schema_to_spark(schema: dict) -> StructType:
    fields = []
    for f in schema["fields"]:
        typ = f["type"]
        if isinstance(typ, list):
            other = typ[0] if typ[1] == "null" else typ[1]
            fields.append(
                StructField(f["name"], _AVRO_TO_SPARK[other], True)
            )
        else:
            fields.append(
                StructField(f["name"], _AVRO_TO_SPARK[typ], False)
            )
    return StructType(fields)


def _avro_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(".avro")
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _AvroReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro requires a load path")
        # The schema Spark hands the reader (user-supplied via
        # .schema(...) or inferred from the first file) binds columns
        # BY NAME against each file's own header — never by position,
        # so a reordered/projected user schema cannot silently bind
        # wrong values to a column.
        self.field_names = [f.name for f in schema.fields]
        self.field_types = {
            f.name: f.dataType.typeName() for f in schema.fields
        }

    def partitions(self):
        files = _avro_files(self.path)
        if not files:
            raise ValueError(f"pyavro: no .avro files under {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        from .avroio import read_container, read_header

        file_schema, _, _, _ = read_header(partition.path)
        file_order = [f["name"] for f in file_schema["fields"]]
        missing = [n for n in self.field_names if n not in file_order]
        if missing:
            raise ValueError(
                f"pyavro: {partition.path} lacks requested fields "
                f"{missing} (file has {file_order})"
            )
        # Per-file type check: a directory mixing same-named fields of
        # different Avro types must fail loudly, not feed mistyped
        # Python values into Spark's row pipeline.
        for f in file_schema["fields"]:
            name = f["name"]
            if name not in self.field_types:
                continue
            typ = f["type"]
            if isinstance(typ, list):
                # union: first non-null branch (any arity)
                branches = [b for b in typ if b != "null"]
                typ = branches[0] if branches else "null"
            # Non-string types (dict logical types like
            # {'type':'long','logicalType':...}) are unhashable — treat
            # as unsupported so the mismatch error below names them
            # instead of raising TypeError on the dict lookup.
            spark_t = (
                _AVRO_TO_SPARK.get(typ) if isinstance(typ, str) else None
            )
            got = spark_t.typeName() if spark_t is not None else None
            if got != self.field_types[name]:
                raise ValueError(
                    f"pyavro: {partition.path} field {name!r} has Avro "
                    f"type {typ!r} (-> {got}), but the bound schema "
                    f"expects {self.field_types[name]!r}"
                )
        idx = [file_order.index(n) for n in self.field_names]
        if idx == list(range(len(file_order))):
            yield from read_container(partition.path)
            return
        for row in read_container(partition.path):
            yield tuple(row[i] for i in idx)


@dataclass
class _Committed(WriterCommitMessage):
    path: str
    rows: int


class _AvroWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyavro requires a save path")
        self.codec = options.get("codec", "deflate")
        self.schema = schema
        self.overwrite = overwrite
        # Overwrite keeps the bare "part" prefix so re-runs stay
        # byte-identical (idempotent-sink contract). Append gets an
        # attempt-UNIQUE job token (not max(existing)+1 — two
        # concurrent append jobs would derive the SAME index from the
        # same directory listing and their os.replace()'d parts would
        # clobber each other, silently losing one job's rows). The
        # token is derived driver-side once per job, so all of a job's
        # parts share a prefix and speculative re-runs of a partition
        # within the job still collapse to one file.
        self.prefix = "part"
        if not overwrite:
            import uuid

            self.prefix = f"part-j{uuid.uuid4().hex[:12]}"

    def write(self, iterator):
        from pyspark import TaskContext

        from .avroio import write_container

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        avro_schema = spark_schema_to_avro(self.schema)
        names = [f.name for f in self.schema.fields]
        out = os.path.join(self.path, f"{self.prefix}-{pid:05d}.avro")
        # Stage under an attempt-unique name, then atomically rename:
        # concurrent speculative attempts never interleave bytes in the
        # final file, and the deterministic sync seed (partition id, not
        # attempt) keeps re-writes byte-identical — the same
        # idempotent-sink contract as the Zarr shard writer.
        tmp = f"{out}.inprogress-{attempt}"
        n = write_container(
            tmp,
            avro_schema,
            (tuple(row[c] for c in names) for row in iterator),
            codec=self.codec,
            sync_seed=f"part-{pid}",
        )
        os.replace(tmp, out)
        return _Committed(out, n)

    def commit(self, messages):
        # A zero-partition write never runs write() on any executor, so
        # the directory may not exist yet.
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write("")

    def abort(self, messages):
        # Clear staged temp files from failed/killed attempts; finished
        # parts from committed attempts of THIS job stay (harmless —
        # no _SUCCESS marker means readers should treat them as junk).
        if self.path and os.path.isdir(self.path):
            for name in os.listdir(self.path):
                if ".inprogress-" in name:
                    try:
                        os.unlink(os.path.join(self.path, name))
                    except OSError:
                        pass


class AvroDataSource(DataSource):
    """Avro container files as a Spark source AND sink."""

    @classmethod
    def name(cls) -> str:
        return "pyavro"

    def schema(self):
        from .avroio import read_header

        files = _avro_files(self.options.get("path", ""))
        if not files:
            raise ValueError("pyavro: cannot infer schema (no files)")
        schema, _, _, _ = read_header(files[0])
        return avro_schema_to_spark(schema)

    def reader(self, schema: StructType) -> DataSourceReader:
        return _AvroReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        # Driver-side overwrite cleanup (write() runs on executors).
        path = self.options.get("path")
        if overwrite and path and os.path.isdir(path):
            for name in os.listdir(path):
                if name.endswith(".avro") or name == "_SUCCESS":
                    os.unlink(os.path.join(path, name))
        return _AvroWriter(self.options, schema, overwrite)
