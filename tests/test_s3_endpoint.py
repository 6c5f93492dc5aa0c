"""Real-boto3 S3 branch (round-2 verdict item 5): kv_put/kv_get through
an actual boto3 client speaking HTTP to an in-process server that
implements the object PUT/GET subset the kv layer uses — plus the
kv-layer exponential backoff on 503 SlowDown."""

import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.zarrio import kvstore
from aind_exaspim_data_transformation_spark.zarrio.format import (
    ShardSpec,
    encode_shard,
    read_array_region,
    write_array_metadata,
    write_shard_file,
)

pytest.importorskip("boto3")

_ERR_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    "<Error><Code>{code}</Code><Message>{msg}</Message></Error>"
).format


class _S3Handler(BaseHTTPRequestHandler):
    """The S3 REST subset boto3's put_object/get_object emit: PUT and
    GET on /<bucket>/<key>, XML error bodies, 404 NoSuchKey."""

    def _send(self, status: int, body: bytes, ctype="application/xml"):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_PUT(self):
        self.server.put_attempts += 1
        if self.server.throttle_puts > 0:
            self.server.throttle_puts -= 1
            self._send(503, _ERR_XML(code="SlowDown", msg="slow").encode())
            return
        if self.server.forbid_puts:
            self._send(
                403, _ERR_XML(code="AccessDenied", msg="denied").encode()
            )
            return
        length = int(self.headers.get("Content-Length", 0))
        self.server.objects[self.path] = self.rfile.read(length)
        self._send(200, b"")

    def do_GET(self):
        data = self.server.objects.get(self.path)
        if data is None:
            self._send(
                404, _ERR_XML(code="NoSuchKey", msg=self.path).encode()
            )
        else:
            self._send(200, data, ctype="application/octet-stream")

    def log_message(self, *_):
        pass


@pytest.fixture()
def s3_server(monkeypatch):
    server = ThreadingHTTPServer(("127.0.0.1", 0), _S3Handler)
    server.objects = {}
    server.put_attempts = 0
    server.throttle_puts = 0
    server.forbid_puts = False
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    monkeypatch.setenv(
        "SPARK_GRAFT_S3_ENDPOINT",
        f"http://127.0.0.1:{server.server_address[1]}",
    )
    monkeypatch.setenv("SPARK_GRAFT_S3_BACKOFF", "0.01")
    kvstore._CLIENT_CACHE.clear()  # force a fresh client per server/port
    yield server
    server.shutdown()
    kvstore._CLIENT_CACHE.clear()


def test_put_get_roundtrip_real_boto3(s3_server):
    url = "s3://bench-bucket/store/zarr.json"
    kvstore.kv_put(url, b'{"zarr_format": 3}')
    assert s3_server.objects["/bench-bucket/store/zarr.json"] == (
        b'{"zarr_format": 3}'
    )
    assert kvstore.kv_get(url) == b'{"zarr_format": 3}'


def test_missing_key_returns_none(s3_server):
    assert kvstore.kv_get("s3://bench-bucket/absent/key") is None


def test_slowdown_is_retried(s3_server):
    """Two 503 SlowDown responses, then success: kv_put backs off and
    lands the object; the server saw exactly 3 attempts."""
    s3_server.throttle_puts = 2
    kvstore.kv_put("s3://bench-bucket/throttled/shard", b"payload")
    assert s3_server.put_attempts == 3
    assert s3_server.objects["/bench-bucket/throttled/shard"] == b"payload"


def test_access_denied_raises_immediately(s3_server):
    """Non-retryable codes surface after ONE attempt — permission
    errors must not burn the backoff budget."""
    s3_server.forbid_puts = True
    with pytest.raises(Exception) as exc_info:
        kvstore.kv_put("s3://bench-bucket/denied/key", b"x")
    assert s3_server.put_attempts == 1
    assert "AccessDenied" in str(exc_info.value)


def test_shard_write_read_through_endpoint(s3_server):
    """A real encoded Zarr shard written via write_shard_file and read
    back via read_array_region over the boto3 client."""
    rng = np.random.default_rng(17)
    arr = rng.integers(0, 65535, (1, 1, 8, 8, 8), dtype=np.uint16)
    spec = ShardSpec(
        shape=(1, 1, 8, 8, 8),
        shard_shape=(1, 1, 8, 8, 8),
        chunk_shape=(1, 1, 8, 8, 8),
        dtype="uint16",
    )
    store = "s3://bench-bucket/tile.zarr"
    write_array_metadata(store, 0, spec)
    write_shard_file(store, 0, (0, 0, 0, 0, 0), encode_shard(arr, spec))
    got = read_array_region(
        store, 0,
        (slice(0, 1), slice(0, 1), slice(0, 8), slice(0, 8), slice(0, 8)),
        spec,
    )
    np.testing.assert_array_equal(got, arr)


def test_env_credentials_win_over_dummies(s3_server, monkeypatch):
    """With real credentials in the environment (MinIO/LocalStack), the
    endpoint-override client must use boto3's default chain, not the
    hardcoded 'local' dummies; without them the dummies keep the
    auth-less test server working."""
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKIAREALKEY")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "realsecret")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-west-2")
    kvstore._CLIENT_CACHE.clear()
    client = kvstore._client("s3", "bench-bucket")
    creds = client._request_signer._credentials
    assert creds.access_key == "AKIAREALKEY"

    monkeypatch.delenv("AWS_ACCESS_KEY_ID")
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY")
    kvstore._CLIENT_CACHE.clear()
    client = kvstore._client("s3", "bench-bucket")
    assert client._request_signer._credentials.access_key == "local"
    kvstore._CLIENT_CACHE.clear()
