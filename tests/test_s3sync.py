"""S3 sync helpers against a recording fake client (no credentials)."""

import pytest

from aind_exaspim_data_transformation_spark.sources.s3sync import (
    copy_file_to_s3,
    parse_s3_url,
    sync_dir_to_s3,
)


class FakeClient:
    def __init__(self):
        self.uploads = []

    def upload_file(self, path, bucket, key):
        self.uploads.append((path, bucket, key))


def test_parse_s3_url():
    assert parse_s3_url("s3://bkt/a/b") == ("bkt", "a/b")
    assert parse_s3_url("s3://bkt") == ("bkt", "")
    with pytest.raises(ValueError):
        parse_s3_url("http://bkt/a")


def test_sync_dir(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.json").write_text("{}")
    (tmp_path / "sub" / "b.bin").write_bytes(b"x")
    client = FakeClient()
    n = sync_dir_to_s3(str(tmp_path), "s3://bkt/derivatives", client=client)
    assert n == 2
    keys = sorted(k for _, _, k in client.uploads)
    assert keys == ["derivatives/a.json", "derivatives/sub/b.bin"]


def test_copy_file(tmp_path):
    f = tmp_path / "acquisition.json"
    f.write_text("{}")
    client = FakeClient()
    url = copy_file_to_s3(str(f), "s3://bkt/meta/acquisition.json", client)
    assert url == "s3://bkt/meta/acquisition.json"
    assert client.uploads[0][2] == "meta/acquisition.json"
