"""CRC32C known-answer + compressor round trips."""

import pytest

from aind_exaspim_data_transformation_spark.zarrio.codecs import (
    HAVE_ZSTD,
    compress,
    crc32c,
    decompress,
)


def test_crc32c_known_answers():
    # Canonical CRC-32C vectors (RFC 3720 appendix / library test suites).
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_crc32c_incremental_matches_whole():
    data = b"hello zarr v3 sharding"
    assert crc32c(data) == crc32c(data[5:], crc32c(data[:5]))


@pytest.mark.parametrize("codec", ["gzip", "zstd", "none"])
def test_compress_roundtrip(codec):
    if codec == "zstd" and not HAVE_ZSTD:
        pytest.skip("no zstd backend")
    payload = bytes(range(256)) * 100
    # expected_size mirrors the shard decode path (format.py passes the
    # chunk byte count); the pyarrow zstd backend requires it.
    enc = compress(payload, codec, 1 if codec == "gzip" else 3)
    assert decompress(enc, codec, len(payload)) == payload
    if codec != "none":
        assert len(enc) < len(payload)


def test_zstd_deterministic_and_framed():
    """Same (input, level) -> same bytes within one environment (the
    idempotent-rewrite guarantee is per-backend; see codecs.py docstring),
    and the output is a real zstd frame (magic 0x28B52FFD little-endian)."""
    if not HAVE_ZSTD:
        pytest.skip("no zstd backend")
    payload = bytes(range(256)) * 500
    a = compress(payload, "zstd", 3)
    b = compress(payload, "zstd", 3)
    assert a == b
    assert a[:4] == b"\x28\xb5\x2f\xfd"
