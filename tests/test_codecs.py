"""CRC32C known-answer + compressor round trips."""

import pytest

from aind_exaspim_data_transformation_spark.zarrio.codecs import (
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


@pytest.mark.parametrize("codec", ["gzip", "none"])
def test_compress_roundtrip(codec):
    payload = bytes(range(256)) * 100
    enc = compress(payload, codec, 1)
    assert decompress(enc, codec) == payload
    if codec == "gzip":
        assert len(enc) < len(payload)
