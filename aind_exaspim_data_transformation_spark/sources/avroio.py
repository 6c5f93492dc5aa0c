"""Pure-Python Apache Avro Object Container File reader/writer.

Spark's Avro DataSource lives in the external ``spark-avro`` module,
which this container does not ship — but Avro's container format is a
public spec (Apache Avro 1.12.0 specification, "Object Container
Files" + "Binary Encoding"), simple enough to implement from spec the
same way this repo implements HDF5 (``sources/minihdf5.py``) and Zarr
v3 (``zarrio/``). ``sources/avro_datasource.py`` exposes it to
Catalyst as the ``pyavro`` Python DataSource (read + write).

Scope — the subset a tabular engine needs:
- schemas: a record of primitive fields (``null boolean int long float
  double bytes string``) and 2-branch nullable unions
  (``["null", <primitive>]``);
- codecs: ``null`` and ``deflate`` (raw RFC-1951, the spec's required
  optional codec);
- container layout: magic ``Obj\\x01``, file-metadata map
  (``avro.schema`` / ``avro.codec``), 16-byte sync marker, data blocks
  of (row count, byte length, payload, sync).

Determinism: the sync marker is derived from the schema + a caller
seed instead of the spec's "randomly generated" bytes, so re-writing
the same rows yields identical files (the repo-wide idempotent-sink
invariant); any Avro reader accepts it — the spec only requires the
marker to match within the file.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from collections.abc import Iterable, Iterator

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


# --------------------------------------------------------------------------
# Binary encoding primitives (spec: Binary Encoding / Primitive Types)
# --------------------------------------------------------------------------
def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: bytearray, n: int) -> None:
    z = zigzag_encode(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(acc), pos
        shift += 7


def _write_value(out: bytearray, value, typ) -> None:
    if isinstance(typ, list):  # union, restricted to ["null", X]
        if value is None:
            write_long(out, typ.index("null"))
            return
        branch = 1 if typ[0] == "null" else 0
        write_long(out, branch)
        _write_value(out, value, typ[branch])
        return
    if typ == "null":
        return
    if typ == "boolean":
        out.append(1 if value else 0)
    elif typ in ("int", "long"):
        write_long(out, int(value))
    elif typ == "float":
        out.extend(struct.pack("<f", float(value)))
    elif typ == "double":
        out.extend(struct.pack("<d", float(value)))
    elif typ == "bytes":
        raw = bytes(value)
        write_long(out, len(raw))
        out.extend(raw)
    elif typ == "string":
        raw = str(value).encode("utf-8")
        write_long(out, len(raw))
        out.extend(raw)
    else:
        raise ValueError(f"unsupported avro type {typ!r}")


def _read_value(buf: bytes, pos: int, typ):
    if isinstance(typ, list):
        idx, pos = read_long(buf, pos)
        return _read_value(buf, pos, typ[idx])
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] != 0, pos + 1
    if typ in ("int", "long"):
        return read_long(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "bytes":
        n, pos = read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if typ == "string":
        n, pos = read_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    raise ValueError(f"unsupported avro type {typ!r}")


def _field_types(schema: dict) -> list[tuple[str, object]]:
    if schema.get("type") != "record":
        raise ValueError("top-level schema must be a record")
    out = []
    for f in schema["fields"]:
        typ = f["type"]
        if isinstance(typ, list):
            if len(typ) != 2 or "null" not in typ:
                raise ValueError(f"unsupported union {typ!r}")
            other = typ[0] if typ[1] == "null" else typ[1]
            if not isinstance(other, str) or other not in _PRIMITIVES:
                raise ValueError(f"unsupported union branch {other!r}")
        elif not isinstance(typ, str) or typ not in _PRIMITIVES:
            raise ValueError(f"unsupported field type {typ!r}")
        out.append((f["name"], typ))
    return out


def _sync_marker(schema_json: str, seed: str) -> bytes:
    return hashlib.md5((schema_json + "\x00" + seed).encode()).digest()


# --------------------------------------------------------------------------
# Container file write / read
# --------------------------------------------------------------------------
def write_container(
    path: str,
    schema: dict,
    rows: Iterable[tuple],
    codec: str = "deflate",
    block_rows: int = 4096,
    sync_seed: str = "",
) -> int:
    """Write rows (tuples in schema field order) as one container file.
    Returns the number of rows written."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    sync = _sync_marker(schema_json, sync_seed)
    fields = _field_types(schema)

    header = bytearray(MAGIC)
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
    }
    write_long(header, len(meta))
    for k in sorted(meta):
        _write_value(header, k, "string")
        _write_value(header, meta[k], "bytes")
    write_long(header, 0)  # end of metadata map
    header.extend(sync)

    n_total = 0
    with open(path, "wb") as f:
        f.write(bytes(header))
        block = bytearray()
        n_block = 0

        def flush():
            nonlocal block, n_block, n_total
            if not n_block:
                return
            payload = bytes(block)
            if codec == "deflate":
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            head = bytearray()
            write_long(head, n_block)
            write_long(head, len(payload))
            f.write(bytes(head) + payload + sync)
            n_total += n_block
            block = bytearray()
            n_block = 0

        for row in rows:
            for value, (_, typ) in zip(row, fields):
                _write_value(block, value, typ)
            n_block += 1
            if n_block >= block_rows:
                flush()
        flush()
    return n_total


def read_header(path: str) -> tuple[dict, str, bytes, int]:
    """(schema, codec, sync marker, data start offset) of a container.

    Reads only the header region (64 KiB probe, doubling on demand) —
    schema inference over a directory of large containers must not
    slurp every file.
    """
    probe = 65536
    with open(path, "rb") as f:
        buf = f.read(probe)
        while True:
            try:
                return _parse_header(buf, path)
            except (
                IndexError,
                KeyError,
                json.JSONDecodeError,
                UnicodeDecodeError,
            ):
                more = f.read(probe)
                if not more:
                    raise ValueError(
                        f"{path}: truncated Avro header"
                    ) from None
                buf += more
                probe *= 2


def _parse_header(buf: bytes, path: str) -> tuple[dict, str, bytes, int]:
    if buf[:4] != MAGIC:
        raise ValueError(f"{path}: not an Avro container (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = read_long(buf, pos)
        if count == 0:
            break
        if count < 0:  # spec: negative count is followed by byte size
            count = -count
            _, pos = read_long(buf, pos)
        for _ in range(count):
            k, pos = _read_value(buf, pos, "string")
            v, pos = _read_value(buf, pos, "bytes")
            meta[k] = v
    sync = buf[pos : pos + 16]
    if len(sync) != 16:
        raise IndexError("truncated header probe")  # retried with more
    pos += 16
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, pos


def read_container(path: str) -> Iterator[tuple]:
    """Yield rows (tuples in schema field order) from a container file.

    The file is read ONCE into a single buffer shared by header and
    block parsing (read_header is for header-only probes).
    """
    with open(path, "rb") as f:
        buf = f.read()
    schema, codec, sync, pos = _parse_header(buf, path)
    fields = _field_types(schema)
    while pos < len(buf):
        count, pos = read_long(buf, pos)
        size, pos = read_long(buf, pos)
        payload = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt file)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        p = 0
        for _ in range(count):
            row = []
            for _, typ in fields:
                value, p = _read_value(payload, p, typ)
                row.append(value)
            yield tuple(row)
