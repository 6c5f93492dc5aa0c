"""Minimal pure-Python HDF5 subset (reader + writer).

h5py is not installed in every environment this engine runs in, but the
reference's subtlest correctness hazards live in its HDF5 branch: scalar
attributes stored as byte-character arrays decoded via ``.tobytes()``
(reference utils/io_utils.py:461-466) and chunk-padded dataset shapes
that must be overridden by the DataSetInfo metadata shape (:430-525,
regression tests tests/test_imaris_job.py:1309-1387). This module lets
pytest exercise ``Hdf5ImarisSource`` end-to-end by implementing a small,
honest subset of the REAL HDF5 binary format, re-derived from the public
HDF5 File Format Specification (version 0 superblock):

- superblock v0; version-1 object headers (no continuation blocks);
- "old-style" groups: symbol-table message -> v1 B-tree (single leaf)
  + local heap + SNOD;
- contiguous (layout class 1) datasets of little-endian fixed-point
  types, read by memmap so hyperslab slicing touches only needed pages;
- chunked (layout class 2) datasets indexed by a v1 B-tree of raw-data
  chunks (node type 1, multi-level), with the optional deflate filter
  (filter pipeline message, filter id 1 = raw zlib streams) — the
  layout real Imaris files use (reference utils/io_utils.py:96-99,
  171-175 plans around native HDF5 chunks); edge chunks are stored
  full-size per the spec and clipped on read;
- version-1 attribute messages; 1-byte string element type (class 3,
  size 1) so attributes round-trip as the ``S1`` byte arrays whose
  ``.tobytes()`` decode the Imaris quirk requires.

The h5py-shaped surface (``File``/``Group``/``Dataset``/``.attrs``) is
exactly what ``Hdf5ImarisSource`` consumes; when h5py exists it wins (see
``tensor.open_h5``), and files written here are spec-conformant so h5py
can cross-check them (tests/test_imaris_hdf5.py gates that on import).

Supported filters: deflate (id 1, raw zlib streams) and shuffle (id 2,
byte de-interleave — real microscopy HDF5 commonly pairs shuffle+deflate;
the reference reads them transparently via h5py, utils/io_utils.py:
122-151). Deliberately NOT supported: v2 B-trees, fractal heaps,
fletcher32/szip filters, >1 group B-tree level (the writer caps children
per group well below the leaf k), non-ASCII link names.
"""

from __future__ import annotations

import itertools
import mmap
import os
import struct
import zlib

import numpy as np

SIGNATURE = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF

# message type ids
MSG_DATASPACE = 0x0001
MSG_DATATYPE = 0x0003
MSG_FILL_VALUE = 0x0005
MSG_LAYOUT = 0x0008
MSG_FILTER_PIPELINE = 0x000B
MSG_CONTINUATION = 0x0010
MSG_ATTRIBUTE = 0x000C
MSG_SYMBOL_TABLE = 0x0011

FILTER_DEFLATE = 1
FILTER_SHUFFLE = 2


def shuffle_bytes(blob: bytes, itemsize: int) -> bytes:
    """HDF5 shuffle filter (forward): interleave so byte k of every
    element is contiguous. Trailing bytes that don't fill an element are
    passed through, as libhdf5 does."""
    if itemsize <= 1:
        return blob
    n = len(blob) // itemsize
    body = np.frombuffer(blob, np.uint8, count=n * itemsize)
    return body.reshape(n, itemsize).T.tobytes() + blob[n * itemsize :]


def unshuffle_bytes(blob: bytes, itemsize: int) -> bytes:
    """HDF5 shuffle filter (inverse): byte de-interleave."""
    if itemsize <= 1:
        return blob
    n = len(blob) // itemsize
    body = np.frombuffer(blob, np.uint8, count=n * itemsize)
    return body.reshape(itemsize, n).T.tobytes() + blob[n * itemsize :]

# v1 chunk-B-tree fan-out: libhdf5's default "indexed storage internal
# node K" is 32, i.e. up to 2K = 64 entries per node. The writer splits
# at this bound so real readers accept its trees.
CHUNK_BTREE_MAX = 64

_FIXED_DTYPES = {1: "u1", 2: "u2", 4: "u4", 8: "u8"}


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


# ==========================================================================
# Writer
# ==========================================================================
class _Writer:
    """Append-only allocator over a bytearray; superblock patched last."""

    def __init__(self):
        self.buf = bytearray(96)  # superblock placeholder

    def alloc(self, blob: bytes) -> int:
        addr = len(self.buf)
        self.buf += blob
        return addr

    # -- low-level records ------------------------------------------------
    def _message(self, mtype: int, body: bytes) -> bytes:
        body = _pad8(body)
        return struct.pack("<HHB3x", mtype, len(body), 0) + body

    def _object_header(self, messages: list[tuple[int, bytes]]) -> int:
        body = b"".join(self._message(t, b) for t, b in messages)
        prefix = struct.pack("<BxHI", 1, len(messages), 1)
        prefix += struct.pack("<I", len(body)) + b"\x00" * 4
        return self.alloc(prefix + body)

    def _dataspace_body(self, dims: tuple[int, ...]) -> bytes:
        return struct.pack("<BBB5x", 1, len(dims), 0) + b"".join(
            struct.pack("<Q", d) for d in dims
        )

    def _datatype_body(self, dt: np.dtype) -> bytes:
        dt = np.dtype(dt)
        if dt.kind == "u" and dt.itemsize in _FIXED_DTYPES:
            # fixed-point class 0 v1, little-endian, unsigned
            return struct.pack(
                "<B3BIHH", 0x10, 0, 0, 0, dt.itemsize, 0, dt.itemsize * 8
            )
        if dt == np.dtype("S1"):
            # string class 3 v1, null-terminated, ASCII, 1 byte
            return struct.pack("<B3BI", 0x13, 0, 0, 0, 1)
        raise ValueError(f"minihdf5 writer: unsupported dtype {dt}")

    def _attribute_body(self, name: str, value: np.ndarray) -> bytes:
        value = np.ascontiguousarray(value)
        name_b = name.encode("ascii") + b"\x00"
        dt_b = self._datatype_body(value.dtype)
        ds_b = self._dataspace_body(value.shape)
        return (
            struct.pack("<BxHHH", 1, len(name_b), len(dt_b), len(ds_b))
            + _pad8(name_b)
            + _pad8(dt_b)
            + _pad8(ds_b)
            + value.tobytes(order="C")
        )

    # -- chunked storage ---------------------------------------------------
    def _chunk_key(
        self, nbytes: int, mask: int, offsets: tuple[int, ...]
    ) -> bytes:
        return struct.pack("<II", nbytes, mask) + b"".join(
            struct.pack("<Q", o) for o in offsets
        )

    def _chunk_btree(
        self,
        entries: list[tuple[tuple[int, ...], int, int, int]],
        shape: tuple[int, ...],
        chunks: tuple[int, ...],
    ) -> int:
        """Build a v1 B-tree (node type 1) over ``entries`` =
        [(chunk offsets incl. trailing 0, data addr, stored nbytes,
        filter mask)] in row-major chunk order; returns the root address.
        Nodes split at CHUNK_BTREE_MAX so libhdf5's default fan-out
        accepts them; sibling pointers are patched after allocation."""
        # Sentinel final key for the rightmost node of every level: the
        # offset of the chunk one past the whole grid (monotonically
        # greater than every real key, as libhdf5 writes it).
        past_end = tuple(
            -(-s // c) * c for s, c in zip(shape, chunks)
        ) + (0,)
        sentinel = self._chunk_key(0, 0, past_end)

        # level-0 nodes: [(first_key, node_bytes_sans_siblings)]
        def build_nodes(
            items: list[tuple[bytes, int]], level: int
        ) -> list[tuple[bytes, int]]:
            """items: [(key, child_addr)] -> one btree level; returns
            [(first_key, node_addr)] for the level above."""
            groups = [
                items[i : i + CHUNK_BTREE_MAX]
                for i in range(0, len(items), CHUNK_BTREE_MAX)
            ]
            nodes: list[tuple[bytes, int]] = []
            addrs: list[int] = []
            for gi, grp in enumerate(groups):
                body = b"".join(k + struct.pack("<Q", a) for k, a in grp)
                final = (
                    groups[gi + 1][0][0] if gi + 1 < len(groups) else sentinel
                )
                blob = (
                    struct.pack("<4sBBH", b"TREE", 1, level, len(grp))
                    + struct.pack("<QQ", UNDEF, UNDEF)
                    + body
                    + final
                )
                addrs.append(self.alloc(blob))
                nodes.append((grp[0][0], addrs[-1]))
            for i, addr in enumerate(addrs):  # sibling patch
                left = addrs[i - 1] if i > 0 else UNDEF
                right = addrs[i + 1] if i + 1 < len(addrs) else UNDEF
                self.buf[addr + 8 : addr + 24] = struct.pack(
                    "<QQ", left, right
                )
            return nodes

        items = [
            (self._chunk_key(nbytes, mask, offs), addr)
            for offs, addr, nbytes, mask in entries
        ]
        if not items:
            # A chunked dataset with a zero-size dim has no chunks; the
            # layout message carries the undefined address (the reader
            # treats it as an empty index). Without this, build_nodes
            # would return [] forever and the loop below never exits.
            return UNDEF
        level = 0
        while True:
            nodes = build_nodes(items, level)
            if len(nodes) == 1:
                return nodes[0][1]
            items = nodes
            level += 1

    # -- nodes -------------------------------------------------------------
    def write_dataset(
        self,
        data: np.ndarray,
        attrs: dict[str, np.ndarray] | None = None,
        chunks: tuple[int, ...] | None = None,
        compression: str | None = None,
        compression_level: int = 4,
        shuffle: bool = False,
    ) -> int:
        data = np.ascontiguousarray(data)
        le = data.astype(data.dtype.newbyteorder("<"), copy=False)
        messages = [
            (MSG_DATASPACE, self._dataspace_body(data.shape)),
            (MSG_DATATYPE, self._datatype_body(data.dtype)),
            # fill value v2, undefined (no fill written)
            (MSG_FILL_VALUE, struct.pack("<BBBB", 2, 1, 0, 0)),
        ]
        if chunks is None:
            if compression is not None or shuffle:
                raise ValueError("minihdf5: compression requires chunks")
            raw_addr = self.alloc(le.tobytes(order="C"))
            messages.append(
                (MSG_LAYOUT, struct.pack("<BBQQ", 3, 1, raw_addr, data.nbytes))
            )
        else:
            chunks = tuple(int(c) for c in chunks)
            if len(chunks) != data.ndim:
                raise ValueError("minihdf5: chunks rank != data rank")
            if compression not in (None, "gzip"):
                raise ValueError(
                    f"minihdf5: unsupported compression {compression!r}"
                )
            entries = []
            for offs in itertools.product(
                *[range(0, s, c) for s, c in zip(data.shape, chunks)]
            ):
                sl = tuple(
                    slice(o, min(o + c, s))
                    for o, c, s in zip(offs, chunks, data.shape)
                )
                block = le[sl]
                if block.shape != chunks:
                    # Edge chunks are stored full-size per the spec
                    # (fill-padded); readers clip via the dataspace dims.
                    pad = np.zeros(chunks, dtype=le.dtype)
                    pad[tuple(slice(0, e) for e in block.shape)] = block
                    block = pad
                blob = block.tobytes(order="C")
                if shuffle:
                    blob = shuffle_bytes(blob, le.dtype.itemsize)
                if compression == "gzip":
                    blob = zlib.compress(blob, compression_level)
                entries.append((offs + (0,), self.alloc(blob), len(blob), 0))
            btree_addr = self._chunk_btree(entries, data.shape, chunks)
            body = struct.pack("<BBB", 3, 2, data.ndim + 1)
            body += struct.pack("<Q", btree_addr)
            body += b"".join(struct.pack("<I", c) for c in chunks)
            body += struct.pack("<I", data.dtype.itemsize)
            messages.append((MSG_LAYOUT, body))
            if compression == "gzip" or shuffle:
                # filter pipeline v1, records in WRITE order (shuffle
                # before deflate); each record: 8-byte header + client
                # values (1 each here), odd count -> 4 pad bytes
                records = b""
                nfilt = 0
                if shuffle:
                    records += struct.pack(
                        "<HHHH", FILTER_SHUFFLE, 0, 0, 1
                    ) + struct.pack("<I", le.dtype.itemsize) + b"\x00" * 4
                    nfilt += 1
                if compression == "gzip":
                    records += struct.pack(
                        "<HHHH", FILTER_DEFLATE, 0, 0, 1
                    ) + struct.pack("<I", compression_level) + b"\x00" * 4
                    nfilt += 1
                filt = struct.pack("<BB6x", 1, nfilt) + records
                messages.append((MSG_FILTER_PIPELINE, filt))
        for aname, aval in (attrs or {}).items():
            messages.append((MSG_ATTRIBUTE, self._attribute_body(aname, aval)))
        return self._object_header(messages)

    def write_group(
        self,
        children: dict[str, int],
        attrs: dict[str, np.ndarray] | None = None,
    ) -> int:
        """children: link name -> object header address."""
        names = sorted(children)  # SNOD entries must be name-ordered
        if len(names) > 16:  # exactly one leaf's 2K=16 capacity (K=8
            # declared in the superblock; finish())
            raise ValueError("minihdf5 writer: too many links in one group")
        # local heap: empty string at offset 0, then each name
        heap = bytearray(b"\x00" * 8)
        offsets = {}
        for n in names:
            offsets[n] = len(heap)
            heap += _pad8(n.encode("ascii") + b"\x00")
        heap_data_addr_pos = None
        header = struct.pack("<4sB3xQQ", b"HEAP", 0, len(heap), UNDEF)
        heap_addr = self.alloc(header + struct.pack("<Q", 0))
        heap_data_addr_pos = heap_addr + len(header)
        heap_data_addr = self.alloc(bytes(heap))
        self.buf[heap_data_addr_pos : heap_data_addr_pos + 8] = struct.pack(
            "<Q", heap_data_addr
        )
        # SNOD with every entry (one leaf)
        entries = b""
        for n in names:
            entries += struct.pack(
                "<QQI4x16x", offsets[n], children[n], 0
            )
        snod_addr = self.alloc(
            struct.pack("<4sBxH", b"SNOD", 1, len(names)) + entries
        )
        # B-tree v1, node type 0, level 0, one child (zero for an empty
        # group — attribute-only groups like DataSetInfo/Image are legal)
        n_entries = 1 if names else 0
        btree = struct.pack(
            "<4sBBHQQ", b"TREE", 0, 0, n_entries, UNDEF, UNDEF
        )
        if names:
            btree += struct.pack("<Q", 0)  # key 0: empty string offset
            btree += struct.pack("<Q", snod_addr)
            btree += struct.pack("<Q", offsets[names[-1]])  # key: last name
        btree_addr = self.alloc(btree)
        messages = [
            (MSG_SYMBOL_TABLE, struct.pack("<QQ", btree_addr, heap_addr))
        ]
        for aname, aval in (attrs or {}).items():
            messages.append((MSG_ATTRIBUTE, self._attribute_body(aname, aval)))
        return self._object_header(messages)

    def finish(self, root_addr: int) -> bytes:
        sb = SIGNATURE
        sb += struct.pack("<8B", 0, 0, 0, 0, 0, 8, 8, 0)
        # Group Leaf Node K = 8: a symbol node holds up to 2K = 16
        # entries, matching write_group's 16-link cap exactly (K = 4
        # would declare an 8-entry capacity while groups with 9-16
        # links emit one 16-entry SNOD — non-conformant, and libhdf5
        # sizes nodes from K).
        sb += struct.pack("<HHI", 8, 16, 0)
        sb += struct.pack("<QQQQ", 0, UNDEF, len(self.buf), UNDEF)
        sb += struct.pack("<QQI4x16x", 0, root_addr, 0)
        assert len(sb) == 96
        self.buf[:96] = sb
        return bytes(self.buf)


def write_file(path: str, tree: dict) -> str:
    """Write a nested dict tree to an HDF5 file.

    ``tree`` values: nested dict = group; np.ndarray = dataset
    (contiguous layout); ``(np.ndarray, opts_dict)`` = dataset with
    storage options (``chunks``, ``compression``, ``compression_level``,
    ``shuffle`` — see ``_Writer.write_dataset``). A group dict may carry an
    ``"@attrs"`` key (dict of name -> np.ndarray of S1 chars, as Imaris
    stores scalars).
    """
    w = _Writer()

    def emit(node: dict) -> int:
        children = {}
        for name, val in node.items():
            if name == "@attrs":
                continue
            if isinstance(val, dict):
                children[name] = emit(val)
            elif isinstance(val, tuple):
                arr, opts = val
                children[name] = w.write_dataset(np.asarray(arr), **opts)
            else:
                children[name] = w.write_dataset(np.asarray(val))
        return w.write_group(children, node.get("@attrs"))

    root = emit(tree)
    blob = w.finish(root)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def str_attr(value) -> np.ndarray:
    """Encode a scalar the way Imaris does: an array of 1-byte chars, so
    readers must ``.tobytes()`` it (the reference quirk)."""
    s = str(value).encode("ascii")
    return np.frombuffer(s, dtype="S1").copy()


# ==========================================================================
# Reader
# ==========================================================================
class Dataset:
    def __init__(self, path: str, shape, dtype, data_addr, attrs):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.attrs = attrs
        self._mm = np.memmap(
            path, dtype=self.dtype, mode="r", offset=data_addr,
            shape=self.shape, order="C",
        )

    def __getitem__(self, sl):
        return np.asarray(self._mm[sl])


class ChunkedDataset:
    """Chunked (layout class 2) dataset: hyperslab reads touch only the
    chunks that intersect the selection, decompressing each at most once
    — the same access pattern libhdf5 gives the reference's
    native-chunk-aligned reads (utils/io_utils.py:96-99)."""

    def __init__(
        self, file: "File", shape, dtype, chunk_dims, btree_addr, filters,
        attrs,
    ):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.attrs = attrs
        self._file = file
        self._chunks = tuple(chunk_dims)
        self._btree_addr = btree_addr
        self._filters = filters  # [(filter_id, flags, client_values)]
        self._index: dict[tuple[int, ...], tuple[int, int, int]] | None = None

    def _chunk_index(self) -> dict[tuple[int, ...], tuple[int, int, int]]:
        """offsets -> (addr, stored nbytes, filter mask), built by one
        B-tree walk on first access and cached (a real 100k-chunk .ims
        index is ~5 MB — cheap next to the voxel payload)."""
        if self._index is None:
            self._index = {}
            if self._btree_addr != UNDEF:  # zero-size dataset: no chunks
                self._walk(self._btree_addr, len(self.shape))
        return self._index

    def _walk(self, addr: int, rank: int) -> None:
        raw = self._file._raw
        sig, ntype, level, used = struct.unpack_from("<4sBBH", raw, addr)
        assert sig == b"TREE" and ntype == 1, "bad chunk B-tree node"
        key_size = 8 + (rank + 1) * 8
        pos = addr + 8 + 16  # skip siblings
        for _ in range(used):
            nbytes, mask = struct.unpack_from("<II", raw, pos)
            offs = struct.unpack_from(f"<{rank + 1}Q", raw, pos + 8)
            child = struct.unpack_from("<Q", raw, pos + key_size)[0]
            pos += key_size + 8
            if level > 0:
                self._walk(child, rank)
            else:
                self._index[offs[:rank]] = (child, nbytes, mask)

    def _decode_chunk(self, addr: int, nbytes: int, mask: int) -> np.ndarray:
        blob = bytes(self._file._raw[addr : addr + nbytes])
        # The pipeline lists filters in write order; decoding inverts
        # them in REVERSE (deflate inverse before shuffle inverse for
        # the common shuffle+deflate pairing).
        for i, (fid, _flags, vals) in reversed(
            list(enumerate(self._filters))
        ):
            if mask & (1 << i):  # filter skipped for this chunk
                continue
            if fid == FILTER_DEFLATE:
                blob = zlib.decompress(blob)
            elif fid == FILTER_SHUFFLE:
                blob = unshuffle_bytes(
                    blob, vals[0] if vals else self.dtype.itemsize
                )
            else:
                raise ValueError(
                    f"minihdf5: unsupported filter id {fid} "
                    f"(supported: {FILTER_DEFLATE}=deflate, "
                    f"{FILTER_SHUFFLE}=shuffle)"
                )
        return np.frombuffer(blob, dtype=self.dtype).reshape(self._chunks)

    def __getitem__(self, sl):
        if not isinstance(sl, tuple):
            sl = (sl,)
        if any(s is Ellipsis for s in sl):
            raise TypeError("minihdf5: Ellipsis indexing not supported")
        sl = sl + (slice(None),) * (len(self.shape) - len(sl))
        bounds = []
        for s, dim in zip(sl, self.shape):
            if not isinstance(s, slice) or s.step not in (None, 1):
                raise TypeError(
                    "minihdf5: only step-1 slice indexing on chunked data"
                )
            # slice.indices normalizes negative bounds and clamps to the
            # extent — numpy/h5py semantics (ds[-5:] is the last 5 rows,
            # not a fill-padded dim+5 result)
            b0, b1, _ = s.indices(dim)
            bounds.append((b0, b1))
        out = np.zeros(
            tuple(max(0, b1 - b0) for b0, b1 in bounds), dtype=self.dtype
        )
        if out.size == 0:
            return out
        index = self._chunk_index()
        grids = [
            range(b0 // c * c, b1, c)
            for (b0, b1), c in zip(bounds, self._chunks)
        ]
        for corner in itertools.product(*grids):
            entry = index.get(corner)
            if entry is None:  # unallocated chunk -> fill (zeros)
                continue
            chunk = self._decode_chunk(*entry)
            src = tuple(
                slice(max(b0 - o, 0), min(b1 - o, c))
                for o, c, (b0, b1) in zip(corner, self._chunks, bounds)
            )
            dst = tuple(
                slice(max(o - b0, 0), max(o - b0, 0) + (s.stop - s.start))
                for o, (b0, _), s in zip(corner, bounds, src)
            )
            out[dst] = chunk[src]
        return out


class Group:
    def __init__(self, file: "File", links: dict[str, int], attrs):
        self._file = file
        self._links = links
        self.attrs = attrs

    def __contains__(self, key: str) -> bool:
        return self._file._resolve(self, key) is not None

    def __getitem__(self, key: str):
        node = self._file._resolve(self, key)
        if node is None:
            raise KeyError(key)
        return node


class File(Group):
    """h5py-shaped reader for the subset this module writes."""

    def __init__(self, path: str, mode: str = "r"):
        if mode != "r":
            raise ValueError("minihdf5.File is read-only; use write_file")
        self.path = path
        # mmap, not read(): only the metadata pages actually touched are
        # paged in, so opening a multi-GB .ims stays cheap on executors.
        self._fh = open(path, "rb")
        self._raw = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)
        if self._raw[:8] != SIGNATURE:
            raise ValueError(f"not an HDF5 file: {path!r}")
        if self._raw[8] != 0:
            raise ValueError("minihdf5: only superblock v0 supported")
        if self._raw[13] != 8 or self._raw[14] != 8:
            raise ValueError("minihdf5: only 8-byte offsets/lengths")
        root_addr = struct.unpack_from("<Q", self._raw, 64)[0]
        links, attrs = self._read_object(root_addr)
        super().__init__(self, links, attrs)

    def close(self) -> None:
        self._raw.close()
        self._fh.close()

    # -- parsing -----------------------------------------------------------
    def _read_object(self, addr: int):
        """-> (links | None, attrs) for groups, or Dataset for datasets."""
        version, n_msgs, _refs, body_size = struct.unpack_from(
            "<BxHII", self._raw, addr
        )
        if version != 1:
            raise ValueError("minihdf5: only v1 object headers")
        pos, end = addr + 16, addr + 16 + body_size
        attrs: dict[str, np.ndarray] = {}
        links = None
        shape = dtype = data_addr = None
        chunk_dims = chunk_btree = None
        filters: list[tuple[int, int, tuple[int, ...]]] = []
        for _ in range(n_msgs):
            if pos >= end:
                break
            mtype, msize, _flags = struct.unpack_from("<HHB", self._raw, pos)
            body = self._raw[pos + 8 : pos + 8 + msize]
            pos += 8 + msize
            if mtype == MSG_SYMBOL_TABLE:
                btree_addr, heap_addr = struct.unpack("<QQ", body[:16])
                links = self._read_group_links(btree_addr, heap_addr)
            elif mtype == MSG_DATASPACE:
                shape = self._parse_dataspace(body)
            elif mtype == MSG_DATATYPE:
                dtype = self._parse_datatype(body)
            elif mtype == MSG_LAYOUT:
                v, cls = body[0], body[1]
                if v != 3 or cls not in (1, 2):
                    raise ValueError(
                        "minihdf5: only v3 contiguous/chunked layout"
                    )
                if cls == 1:
                    data_addr = struct.unpack("<Q", body[2:10])[0]
                else:  # chunked: dimensionality incl. element-size dim
                    ndims = body[2]
                    chunk_btree = struct.unpack("<Q", body[3:11])[0]
                    dims = struct.unpack_from(f"<{ndims}I", body, 11)
                    chunk_dims = dims[:-1]  # last = element size
            elif mtype == MSG_FILTER_PIPELINE:
                filters = self._parse_filter_pipeline(body)
            elif mtype == MSG_ATTRIBUTE:
                name, value = self._parse_attribute(body)
                attrs[name] = value
            elif mtype == MSG_CONTINUATION:
                raise ValueError(
                    "minihdf5: header continuation blocks not supported"
                )
        if links is not None:
            return links, attrs
        if chunk_dims is not None:
            return ChunkedDataset(
                self, shape, dtype, chunk_dims, chunk_btree, filters, attrs
            )
        return Dataset(self.path, shape, dtype, data_addr, attrs)

    def _read_group_links(self, btree_addr: int, heap_addr: int):
        sig, _v, heap_size, _free = struct.unpack_from(
            "<4sB3xQQ", self._raw, heap_addr
        )
        assert sig == b"HEAP", "bad local heap signature"
        heap_data = struct.unpack_from("<Q", self._raw, heap_addr + 24)[0]

        def heap_name(off: int) -> str:
            endb = self._raw.find(b"\x00", heap_data + off)
            return self._raw[heap_data + off : endb].decode("ascii")

        links: dict[str, int] = {}

        def walk(addr: int) -> None:
            sig, ntype, level, used = struct.unpack_from(
                "<4sBBH", self._raw, addr
            )
            assert sig == b"TREE" and ntype == 0, "bad group B-tree node"
            pos = addr + 8 + 16  # skip siblings
            children = []
            for i in range(used):
                pos += 8  # key i
                children.append(struct.unpack_from("<Q", self._raw, pos)[0])
                pos += 8
            for child in children:
                if level > 0:
                    walk(child)
                    continue
                csig, _v, nsyms = struct.unpack_from(
                    "<4sBxH", self._raw, child
                )
                assert csig == b"SNOD", "bad symbol node signature"
                epos = child + 8
                for _ in range(nsyms):
                    name_off, oh_addr = struct.unpack_from(
                        "<QQ", self._raw, epos
                    )
                    links[heap_name(name_off)] = oh_addr
                    epos += 40

        walk(btree_addr)
        return links

    def _parse_dataspace(self, body: bytes) -> tuple[int, ...]:
        version, rank, flags = body[0], body[1], body[2]
        if version != 1:
            raise ValueError("minihdf5: only v1 dataspace")
        return struct.unpack_from(f"<{rank}Q", body, 8)

    def _parse_datatype(self, body: bytes) -> np.dtype:
        cls = body[0] & 0x0F
        bits = body[1:4]
        size = struct.unpack("<I", body[4:8])[0]
        if cls == 0:  # fixed point
            if bits[0] & 0x01:
                raise ValueError("minihdf5: big-endian not supported")
            kind = "i" if bits[0] & 0x08 else "u"
            return np.dtype(f"<{kind}{size}")
        if cls == 3:  # string
            return np.dtype(f"S{size}")
        raise ValueError(f"minihdf5: unsupported datatype class {cls}")

    def _parse_filter_pipeline(
        self, body: bytes
    ) -> list[tuple[int, int, tuple[int, ...]]]:
        """-> [(filter id, flags, client values)] in pipeline order."""
        version, nfilters = body[0], body[1]
        if version != 1:
            raise ValueError("minihdf5: only v1 filter pipeline")
        filters = []
        pos = 8
        for _ in range(nfilters):
            fid, name_len, flags, n_vals = struct.unpack_from(
                "<HHHH", body, pos
            )
            pos += 8 + name_len  # name is pre-padded to a multiple of 8
            vals = struct.unpack_from(f"<{n_vals}I", body, pos)
            pos += n_vals * 4
            if n_vals % 2:
                pos += 4  # odd client-value count -> 4 pad bytes
            filters.append((fid, flags, vals))
        return filters

    def _parse_attribute(self, body: bytes):
        _v, name_size, dt_size, ds_size = struct.unpack_from("<BxHHH", body)
        pos = 8
        name = body[pos : pos + name_size].split(b"\x00")[0].decode("ascii")
        pos += len(_pad8(b"\x00" * name_size))
        dtype = self._parse_datatype(body[pos : pos + dt_size])
        pos += len(_pad8(b"\x00" * dt_size))
        shape = self._parse_dataspace(body[pos : pos + ds_size])
        pos += len(_pad8(b"\x00" * ds_size))
        n = int(np.prod(shape)) if shape else 1
        data = body[pos : pos + n * dtype.itemsize]
        return name, np.frombuffer(data, dtype=dtype).reshape(shape).copy()

    # -- path traversal ----------------------------------------------------
    def _resolve(self, start: Group, key: str):
        node = start
        for part in key.strip("/").split("/"):
            if not isinstance(node, Group):
                return None
            addr = node._links.get(part)
            if addr is None:
                return None
            # Cache parsed objects per header address: repeated
            # f[path] lookups (one per read_block in the conversion
            # hot loop) would otherwise re-parse the object header AND
            # return a fresh ChunkedDataset whose lazily-built chunk
            # index (_chunk_index, a full B-tree walk) never survives
            # between reads.
            cache = getattr(self, "_obj_cache", None)
            if cache is None:
                cache = self._obj_cache = {}
            node = cache.get(addr)
            if node is None:
                parsed = self._read_object(addr)
                if isinstance(parsed, (Dataset, ChunkedDataset)):
                    node = parsed
                else:
                    links, attrs = parsed
                    node = Group(self, links, attrs)
                cache[addr] = node
        return node
