"""Minimal from-spec Protocol Buffers runtime shim (``google.protobuf``).

This container ships no ``google.protobuf``, and pyspark's
``transformWithStateInPandas`` Python worker speaks a protobuf-based
state-server protocol (``pyspark/sql/streaming/proto/StateMessage_pb2``
imported lazily by the state clients). This module implements just
enough of the protobuf Python API — from the PUBLIC encoding spec
(protobuf.dev/programming-guides/encoding) and the public
``descriptor.proto`` layout — for that generated module to load and for
its messages to serialize/parse against the JVM state server:

- a generic wire-format reader/writer (varints, 64-bit two's-complement
  negatives, length-delimited strings/bytes/submessages),
- a ``FileDescriptorProto`` parser (the generated code hands the pool a
  serialized file descriptor; descriptor.proto's field numbers are part
  of the public spec),
- dynamic message classes with proto3 semantics: implicit presence for
  scalars (zero values not wired), explicit presence for submessages /
  ``proto3_optional`` fields, oneof exclusivity, repeated fields,
  auto-vivified nested-message assignment (``msg.ttl.durationMs = 5``),
- the generated-code entry points (``descriptor_pool.Default()
  .AddSerializedFile``, ``internal.builder.Build*``,
  ``runtime_version.ValidateProtobufRuntimeVersion``,
  ``symbol_database.Default``).

It is NOT a general protobuf implementation: groups, packed repeated
scalars, maps, extensions, fixed32/64 fields, floats, and services are
unsupported and raise. ``install()`` registers the shim in
``sys.modules`` ONLY when the real package is absent, so environments
with genuine protobuf are untouched.

Same from-spec pattern as ``sources/minihdf5.py`` (HDF5),
``sources/avroio.py`` (Avro container), and ``operators/media_codecs.py``
(PNG/BMP/WAV): public formats implemented against their specifications,
not vendored code.
"""

from __future__ import annotations

import sys
import types as _types

# ---------------------------------------------------------------------------
# Wire format primitives
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1


def write_varint(out: bytearray, v: int) -> None:
    """Base-128 varint; negative ints are 64-bit two's complement."""
    v &= _MASK64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def iter_wire_fields(buf: bytes):
    """Yield (field_number, wire_type, value): ints for varint fields,
    bytes for length-delimited; fixed32/64 and groups raise."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = read_varint(buf, pos)
            yield field, wire, v
        elif wire == 2:
            ln, pos = read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            yield field, wire, buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(
                f"unsupported wire type {wire} (field {field}); this "
                "shim handles varint and length-delimited fields only"
            )


# ---------------------------------------------------------------------------
# descriptor.proto subset (public spec field numbers)
# ---------------------------------------------------------------------------

# FieldDescriptorProto.type values (public enum)
TYPE_INT64 = 3
TYPE_INT32 = 5
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_ENUM = 14
_VARINT_TYPES = {TYPE_INT64, TYPE_INT32, TYPE_BOOL, TYPE_ENUM}
LABEL_REPEATED = 3


class FieldDescriptor:
    __slots__ = (
        "name",
        "number",
        "label",
        "type",
        "type_name",
        "oneof_index",
        "proto3_optional",
        "message_cls",
    )

    def __init__(self):
        self.name = ""
        self.number = 0
        self.label = 1
        self.type = 0
        self.type_name = ""
        self.oneof_index = None
        self.proto3_optional = False
        self.message_cls = None  # resolved in pass 2

    @property
    def repeated(self) -> bool:
        return self.label == LABEL_REPEATED

    @property
    def has_presence(self) -> bool:
        """proto3 explicit presence: submessages, oneof members, and
        proto3-optional fields."""
        return (
            self.type == TYPE_MESSAGE
            or self.oneof_index is not None
            or self.proto3_optional
        )


class Descriptor:
    def __init__(self, name: str, full_name: str):
        self.name = name
        self.full_name = full_name
        self.fields: list[FieldDescriptor] = []
        self.nested: list[Descriptor] = []
        self.enums: list[EnumDescriptor] = []
        self.oneofs: list[str] = []
        self._loaded_options = None

    def __setattr__(self, key, value):  # _serialized_start etc.
        object.__setattr__(self, key, value)


class EnumDescriptor:
    def __init__(self, name: str, full_name: str):
        self.name = name
        self.full_name = full_name
        self.values: list[tuple[str, int]] = []
        self._loaded_options = None


class FileDescriptor:
    def __init__(self):
        self.name = ""
        self.package = ""
        self.messages: list[Descriptor] = []
        self.enums: list[EnumDescriptor] = []
        self._loaded_options = None


def _parse_field(buf: bytes) -> FieldDescriptor:
    f = FieldDescriptor()
    for num, _w, v in iter_wire_fields(buf):
        if num == 1:
            f.name = v.decode("utf-8")
        elif num == 3:
            f.number = v
        elif num == 4:
            f.label = v
        elif num == 5:
            f.type = v
        elif num == 6:
            f.type_name = v.decode("utf-8")
        elif num == 9:
            f.oneof_index = v
        elif num == 17:
            f.proto3_optional = bool(v)
    return f


def _parse_enum(buf: bytes, prefix: str) -> EnumDescriptor:
    e = EnumDescriptor("", "")
    for num, _w, v in iter_wire_fields(buf):
        if num == 1:
            e.name = v.decode("utf-8")
            e.full_name = f"{prefix}.{e.name}"
        elif num == 2:  # EnumValueDescriptorProto
            vname, vnum = "", 0
            for n2, _w2, v2 in iter_wire_fields(v):
                if n2 == 1:
                    vname = v2.decode("utf-8")
                elif n2 == 2:
                    vnum = v2
            e.values.append((vname, vnum))
    return e


def _parse_message(buf: bytes, prefix: str) -> Descriptor:
    d = Descriptor("", "")
    nested_raw: list[bytes] = []
    enums_raw: list[bytes] = []
    for num, _w, v in iter_wire_fields(buf):
        if num == 1:
            d.name = v.decode("utf-8")
            d.full_name = f"{prefix}.{d.name}"
        elif num == 2:
            d.fields.append(_parse_field(v))
        elif num == 3:
            nested_raw.append(v)
        elif num == 4:
            enums_raw.append(v)
        elif num == 8:  # OneofDescriptorProto
            for n2, _w2, v2 in iter_wire_fields(v):
                if n2 == 1:
                    d.oneofs.append(v2.decode("utf-8"))
    for raw in nested_raw:
        d.nested.append(_parse_message(raw, d.full_name))
    for raw in enums_raw:
        d.enums.append(_parse_enum(raw, d.full_name))
    return d


def parse_file_descriptor(data: bytes) -> FileDescriptor:
    """Parse a serialized FileDescriptorProto (the bytes generated code
    passes to AddSerializedFile)."""
    fd = FileDescriptor()
    msgs_raw: list[bytes] = []
    enums_raw: list[bytes] = []
    for num, _w, v in iter_wire_fields(data):
        if num == 1:
            fd.name = v.decode("utf-8")
        elif num == 2:
            fd.package = v.decode("utf-8")
        elif num == 4:
            msgs_raw.append(v)
        elif num == 5:
            enums_raw.append(v)
    prefix = f".{fd.package}" if fd.package else ""
    for raw in msgs_raw:
        fd.messages.append(_parse_message(raw, prefix))
    for raw in enums_raw:
        fd.enums.append(_parse_enum(raw, prefix))
    return fd


# ---------------------------------------------------------------------------
# Dynamic message classes (proto3 semantics)
# ---------------------------------------------------------------------------

_SCALAR_DEFAULTS = {
    TYPE_INT64: 0,
    TYPE_INT32: 0,
    TYPE_BOOL: False,
    TYPE_STRING: "",
    TYPE_BYTES: b"",
    TYPE_ENUM: 0,
}


def _coerce_scalar(fd: FieldDescriptor, value):
    t = fd.type
    if t == TYPE_BOOL:
        return bool(value)
    if t in (TYPE_INT32, TYPE_INT64, TYPE_ENUM):
        return int(value)
    if t == TYPE_STRING:
        if isinstance(value, bytes):
            return value.decode("utf-8")
        return str(value)
    if t == TYPE_BYTES:
        return bytes(value)
    raise TypeError(f"unsupported scalar type {t} for field {fd.name}")


def _decode_wire_scalar(fd: FieldDescriptor, wire: int, value):
    t = fd.type
    if t in _VARINT_TYPES:
        if wire != 0:
            raise ValueError(
                f"field {fd.name}: expected varint (wire 0), got wire "
                f"{wire} — packed repeated scalars are not supported by "
                "this shim (see tests/test_protoshim.py canary)"
            )
        if t == TYPE_BOOL:
            return bool(value)
        v = value
        if t in (TYPE_INT32, TYPE_INT64, TYPE_ENUM) and v >= 1 << 63:
            v -= 1 << 64
        return v
    if t == TYPE_STRING:
        return value.decode("utf-8")
    if t == TYPE_BYTES:
        return bytes(value)
    raise ValueError(f"field {fd.name}: unsupported type {t}")


class _RepeatedField(list):
    """Write-back list for an unset repeated field: reads are
    side-effect-free; the first mutation stores the list in the owning
    message (registering presence only then) and propagates the owner's
    own write-back link up the tree."""

    def __init__(self, owner: "Message", fd: "FieldDescriptor", init=()):
        super().__init__(init)
        self._owner = owner
        self._fd = fd

    def _touch(self) -> None:
        owner = self._owner
        if owner is not None:
            values = owner.__dict__["_values"]
            if self._fd.name not in values:
                values[self._fd.name] = self
            owner._register()

    def append(self, item):
        super().append(item)
        self._touch()

    def extend(self, items):
        super().extend(items)
        self._touch()

    def insert(self, index, item):
        super().insert(index, item)
        self._touch()

    def __setitem__(self, index, item):
        super().__setitem__(index, item)
        self._touch()

    def add(self, **kwargs):  # repeated-message .add() like real protobuf
        sub = self._fd.message_cls(**kwargs)
        self.append(sub)
        return sub


class Message:
    """Base for dynamically built message classes. Field storage is the
    ``_values`` dict (set fields only — presence tracking); reads of
    unset scalars return proto3 defaults without storing. Reads of unset
    submessages / repeated fields are ALSO side-effect-free (like the
    real library): they return a default instance carrying a write-back
    link to the parent, and only an actual mutation registers presence —
    so inspecting ``call.getValueState`` never clears an already-set
    oneof sibling, while ``msg.ttl.durationMs = 5`` and
    ``msg.value.append(b)`` still work."""

    DESCRIPTOR: Descriptor = None  # set per subclass
    _fields_by_name: dict = {}
    _fields_by_number: dict = {}

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_link", None)
        for k, v in kwargs.items():
            if v is None:
                continue
            fd = self._fields_by_name.get(k)
            if fd is None:
                raise ValueError(
                    f"{type(self).__name__} has no field {k!r}"
                )
            if fd.repeated:
                if fd.type == TYPE_MESSAGE:
                    self._values[k] = [self._as_msg(fd, x) for x in v]
                else:
                    self._values[k] = [
                        _coerce_scalar(fd, x) for x in v
                    ]
            elif fd.type == TYPE_MESSAGE:
                self._set_field(fd, self._as_msg(fd, v))
            else:
                self._set_field(fd, _coerce_scalar(fd, v))

    @staticmethod
    def _as_msg(fd: FieldDescriptor, v):
        if not isinstance(v, fd.message_cls):
            raise TypeError(
                f"field {fd.name} expects {fd.message_cls.__name__}, "
                f"got {type(v).__name__}"
            )
        return v

    def _register(self) -> None:
        """Fire this instance's write-back link, if any: store self into
        the parent field that handed it out (read of an unset message
        field) and propagate recursively so the whole chain of defaults
        becomes present on the first real mutation."""
        link = self.__dict__.get("_link")
        if link is not None:
            object.__setattr__(self, "_link", None)
            parent, fd = link
            parent._set_field(fd, self)

    def _set_field(self, fd: FieldDescriptor, value) -> None:
        if fd.oneof_index is not None and not fd.proto3_optional:
            # oneof exclusivity: setting one member clears the others
            for other in self._fields_by_name.values():
                if (
                    other is not fd
                    and other.oneof_index == fd.oneof_index
                    and not other.proto3_optional
                ):
                    self._values.pop(other.name, None)
        self._values[fd.name] = value
        self._register()

    def __getattr__(self, name):
        fd = type(self)._fields_by_name.get(name)
        if fd is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        values = self.__dict__["_values"]
        if name in values:
            return values[name]
        if fd.repeated:
            # side-effect-free read; first mutation writes back
            return _RepeatedField(self, fd)
        if fd.type == TYPE_MESSAGE:
            sub = fd.message_cls()
            object.__setattr__(sub, "_link", (self, fd))
            return sub  # presence registered only on first mutation
        return _SCALAR_DEFAULTS[fd.type]

    def __setattr__(self, name, value):
        fd = self._fields_by_name.get(name)
        if fd is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if fd.repeated:
            self._values[name] = list(value)
            self._register()
        elif fd.type == TYPE_MESSAGE:
            self._set_field(fd, self._as_msg(fd, value))
        else:
            self._set_field(fd, _coerce_scalar(fd, value))

    def HasField(self, name: str) -> bool:
        return name in self._values

    def WhichOneof(self, oneof_name: str):
        """Name of the set member of ``oneof_name``, or None."""
        try:
            idx = self.DESCRIPTOR.oneofs.index(oneof_name)
        except ValueError:
            raise ValueError(
                f"{type(self).__name__} has no oneof {oneof_name!r}"
            ) from None
        for fd in self._fields_by_name.values():
            if (
                fd.oneof_index == idx
                and not fd.proto3_optional
                and fd.name in self._values
            ):
                return fd.name
        return None

    def ClearField(self, name: str) -> None:
        self._values.pop(name, None)

    def CopyFrom(self, other: "Message") -> None:
        self._values.clear()
        self.MergeFromString(other.SerializeToString())
        self._register()  # CopyFrom(empty) still sets presence

    # -- wire ---------------------------------------------------------------

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for fd in sorted(
            self._fields_by_name.values(), key=lambda f: f.number
        ):
            if fd.name not in self._values:
                continue
            value = self._values[fd.name]
            if fd.repeated:
                for item in value:
                    self._write_one(out, fd, item)
            else:
                if not fd.has_presence and value == _SCALAR_DEFAULTS.get(
                    fd.type
                ):
                    continue  # proto3: zero values not wired
                self._write_one(out, fd, value)
        return bytes(out)

    @staticmethod
    def _write_one(out: bytearray, fd: FieldDescriptor, value) -> None:
        if fd.type in _VARINT_TYPES:
            write_varint(out, (fd.number << 3) | 0)
            write_varint(out, int(value))
        elif fd.type == TYPE_MESSAGE:
            payload = value.SerializeToString()
            write_varint(out, (fd.number << 3) | 2)
            write_varint(out, len(payload))
            out.extend(payload)
        else:  # string / bytes
            payload = (
                value.encode("utf-8")
                if fd.type == TYPE_STRING
                else bytes(value)
            )
            write_varint(out, (fd.number << 3) | 2)
            write_varint(out, len(payload))
            out.extend(payload)

    def ParseFromString(self, data: bytes) -> int:
        self._values.clear()
        return self.MergeFromString(data)

    def MergeFromString(self, data: bytes) -> int:
        for num, wire, value in iter_wire_fields(data):
            fd = self._fields_by_number.get(num)
            if fd is None:
                continue  # unknown field: skip (forward compat)
            if fd.type == TYPE_MESSAGE:
                if fd.repeated:
                    sub = fd.message_cls()
                    sub.ParseFromString(value)
                    self.__getattr__(fd.name).append(sub)
                else:
                    existing = self._values.get(fd.name)
                    if existing is None:
                        existing = fd.message_cls()
                        self._set_field(fd, existing)
                    existing.MergeFromString(value)
            else:
                decoded = _decode_wire_scalar(fd, wire, value)
                if fd.repeated:
                    self.__getattr__(fd.name).append(decoded)
                else:
                    self._set_field(fd, decoded)
        self._register()  # merging empty bytes still sets presence
        return len(data)

    ByteSize = lambda self: len(self.SerializeToString())  # noqa: E731

    def __eq__(self, other):
        return (
            type(self) is type(other) and self._values == other._values
        )

    def __repr__(self):
        inner = ", ".join(
            f"{k}={v!r}" for k, v in sorted(self._values.items())
        )
        return f"{type(self).__name__}({inner})"


def build_message_classes(fd: FileDescriptor) -> dict[str, type]:
    """Two-pass class construction: create classes for every (possibly
    nested) message, then resolve message-typed fields by full name."""
    by_full_name: dict[str, type] = {}
    all_descriptors: list[Descriptor] = []

    def walk(msgs: list[Descriptor]):
        for m in msgs:
            all_descriptors.append(m)
            walk(m.nested)

    walk(fd.messages)
    for d in all_descriptors:
        cls = type(
            d.name,
            (Message,),
            {
                "DESCRIPTOR": d,
                "_fields_by_name": {f.name: f for f in d.fields},
                "_fields_by_number": {f.number: f for f in d.fields},
            },
        )
        by_full_name[d.full_name] = cls
    for d in all_descriptors:
        for f in d.fields:
            if f.type == TYPE_MESSAGE:
                cls = by_full_name.get(f.type_name)
                if cls is None:
                    raise ValueError(
                        f"unresolved message type {f.type_name!r} "
                        f"(field {d.full_name}.{f.name})"
                    )
                f.message_cls = cls
    return by_full_name


# ---------------------------------------------------------------------------
# google.protobuf module surface (what generated _pb2 modules import)
# ---------------------------------------------------------------------------


class DescriptorPool:
    _default = None

    def __init__(self):
        self._files: dict[str, FileDescriptor] = {}

    @classmethod
    def Default(cls) -> "DescriptorPool":
        if cls._default is None:
            cls._default = cls()
        return cls._default

    def AddSerializedFile(self, data: bytes) -> FileDescriptor:
        fd = parse_file_descriptor(data)
        self._files[fd.name] = fd
        return fd


def _py_descriptor_name(full_name: str, package: str) -> str:
    rel = full_name
    if package and rel.startswith(f".{package}."):
        rel = rel[len(package) + 2 :]
    return "_" + rel.replace(".", "_").upper()


def _build_message_and_enum_descriptors(file_des, _globals) -> None:
    def walk(msgs):
        for m in msgs:
            _globals[
                _py_descriptor_name(m.full_name, file_des.package)
            ] = m
            for e in m.enums:
                _globals[
                    _py_descriptor_name(e.full_name, file_des.package)
                ] = e
            walk(m.nested)

    walk(file_des.messages)
    for e in file_des.enums:
        _globals[_py_descriptor_name(e.full_name, file_des.package)] = e


def _build_top_descriptors_and_messages(
    file_des, module_name, _globals
) -> None:
    classes = build_message_classes(file_des)

    def attach(msgs, container):
        for m in msgs:
            cls = classes[m.full_name]
            cls.__module__ = module_name
            container[m.name] = cls
            if m.nested or m.enums:
                nested_ns: dict = {}
                attach(m.nested, nested_ns)
                for name, val in nested_ns.items():
                    setattr(cls, name, val)
                for e in m.enums:
                    for vname, vnum in e.values:
                        setattr(cls, vname, vnum)

    attach(file_des.messages, _globals)
    for e in file_des.enums:
        enum_ns = {vname: vnum for vname, vnum in e.values}
        enum_cls = type(e.name, (), dict(enum_ns, DESCRIPTOR=e))
        _globals[e.name] = enum_cls
        _globals.update(enum_ns)  # value names as module globals


def vendor_path() -> str:
    """Directory whose ``google/protobuf`` package loads this shim —
    for PYTHONPATH-style exposure to spawned worker processes."""
    import os

    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "vendor")


def worker_pyfile() -> str:
    """A zip of the vendor ``google`` package suitable for
    ``SparkContext.addPyFile`` (cached in the temp dir). Workers add
    pyFiles to ``sys.path``, so ``import google.protobuf`` resolves to
    the shim there too."""
    import os
    import tempfile
    import zipfile

    out = os.path.join(
        tempfile.gettempdir(), "protoshim-google-vendor.zip"
    )
    if not os.path.exists(out):
        tmp = out + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            root = vendor_path()
            for dirpath, _dirs, files in os.walk(root):
                for fn in files:
                    if fn.endswith(".py"):
                        p = os.path.join(dirpath, fn)
                        z.write(p, os.path.relpath(p, root))
        os.replace(tmp, out)
    return out


def ensure_spark_visibility(spark) -> bool:
    """Make ``google.protobuf`` importable in this session's Python
    workers (no-op when real protobuf exists). Returns True when the
    shim is the provider."""
    if not install():
        return False
    spark.sparkContext.addPyFile(worker_pyfile())
    return True


def install() -> bool:
    """Register the shim as ``google.protobuf`` in ``sys.modules`` when
    (and only when) the real package is absent. Idempotent; safe to call
    on the driver and in every Python worker. Returns True when the shim
    is the active provider."""
    existing = sys.modules.get("google.protobuf")
    if existing is None or not getattr(
        existing, "__is_protoshim_vendor__", False
    ):
        # The vendor placeholder (partially initialized, mid-import)
        # must be REPLACED. A real protobuf is authoritative — but
        # `import google.protobuf` succeeding is NOT enough to prove
        # one: Spark's jars contain `google/` resource directories, and
        # a jar on sys.path makes Python assemble an EMPTY namespace
        # package from them (this is exactly what the TWS worker sees).
        # Only a loadable `google.protobuf.descriptor` counts.
        try:
            import google.protobuf  # noqa: F401

            if getattr(
                sys.modules["google.protobuf"], "__is_protoshim__", False
            ):
                return True
            import importlib

            try:
                importlib.import_module("google.protobuf.descriptor")
                return False  # genuine protobuf installation
            except ImportError:
                # namespace impostor — fall through and replace it
                sys.modules.pop("google.protobuf", None)
        except ImportError:
            pass

    google = sys.modules.get("google")
    if google is None:
        google = _types.ModuleType("google")
        google.__path__ = []  # namespace-package shaped
        sys.modules["google"] = google

    pb = _types.ModuleType("google.protobuf")
    pb.__is_protoshim__ = True
    pb.__version__ = "0.0-protoshim"

    descriptor = _types.ModuleType("google.protobuf.descriptor")
    descriptor._USE_C_DESCRIPTORS = False
    descriptor.Descriptor = Descriptor
    descriptor.FieldDescriptor = FieldDescriptor
    descriptor.FileDescriptor = FileDescriptor
    descriptor.EnumDescriptor = EnumDescriptor

    descriptor_pool = _types.ModuleType("google.protobuf.descriptor_pool")
    descriptor_pool.Default = DescriptorPool.Default
    descriptor_pool.DescriptorPool = DescriptorPool

    runtime_version = _types.ModuleType(
        "google.protobuf.runtime_version"
    )
    runtime_version.Domain = type(
        "Domain", (), {"PUBLIC": 0, "GOOGLE_INTERNAL": 1}
    )
    runtime_version.ValidateProtobufRuntimeVersion = (
        lambda *args, **kwargs: None
    )

    symbol_database = _types.ModuleType(
        "google.protobuf.symbol_database"
    )

    class _SymbolDatabase:
        _instance = None

        @classmethod
        def Default(cls):
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    symbol_database.SymbolDatabase = _SymbolDatabase
    symbol_database.Default = _SymbolDatabase.Default

    internal = _types.ModuleType("google.protobuf.internal")
    builder = _types.ModuleType("google.protobuf.internal.builder")
    builder.BuildMessageAndEnumDescriptors = (
        _build_message_and_enum_descriptors
    )
    builder.BuildTopDescriptorsAndMessages = (
        _build_top_descriptors_and_messages
    )

    message_mod = _types.ModuleType("google.protobuf.message")
    message_mod.Message = Message

    class DecodeError(Exception):
        pass

    message_mod.DecodeError = DecodeError

    for name, mod in [
        ("google.protobuf", pb),
        ("google.protobuf.descriptor", descriptor),
        ("google.protobuf.descriptor_pool", descriptor_pool),
        ("google.protobuf.runtime_version", runtime_version),
        ("google.protobuf.symbol_database", symbol_database),
        ("google.protobuf.internal", internal),
        ("google.protobuf.internal.builder", builder),
        ("google.protobuf.message", message_mod),
    ]:
        sys.modules[name] = mod
    pb.descriptor = descriptor
    pb.descriptor_pool = descriptor_pool
    pb.runtime_version = runtime_version
    pb.symbol_database = symbol_database
    pb.internal = internal
    pb.message = message_mod
    internal.builder = builder
    google.protobuf = pb
    return True
