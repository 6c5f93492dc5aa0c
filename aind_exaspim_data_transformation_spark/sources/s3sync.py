"""S3 sink helpers (SURVEY §2A K1/K3).

Driver-side side-channel uploads, mirroring the reference's derivatives
sync (reference utils/utils.py:149-212, gated to partition 0 at
imaris_job.py:723-725 — here the driver does it once, trivially). Shard
payloads themselves would go to S3 via an s3:// store path on a real
cluster (any fsspec/Hadoop s3a mount); this module covers the plain
boto3 directory sync + single-file copy the reference shells out for.

boto3 is import-gated: local runs and tests work without credentials.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse


def parse_s3_url(url: str) -> tuple[str, str]:
    """s3://bucket/prefix -> (bucket, prefix)."""
    parts = urlparse(url)
    if parts.scheme != "s3" or not parts.netloc:
        raise ValueError(f"not an s3 url: {url!r}")
    return parts.netloc, parts.path.lstrip("/")


def sync_dir_to_s3(local_dir: str, s3_url: str, client=None) -> int:
    """Upload every file under ``local_dir`` to the bucket/prefix; returns
    the number of objects uploaded."""
    bucket, prefix = parse_s3_url(s3_url)
    if client is None:  # pragma: no cover - needs credentials
        import boto3

        client = boto3.client("s3")
    n = 0
    for root, _, files in os.walk(local_dir):
        for fname in sorted(files):
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, local_dir)
            key = f"{prefix.rstrip('/')}/{rel}" if prefix else rel
            client.upload_file(path, bucket, key)
            n += 1
    return n


def copy_file_to_s3(local_path: str, s3_url: str, client=None) -> str:
    """Upload one file; the s3_url is the full destination object URL."""
    bucket, key = parse_s3_url(s3_url)
    if client is None:  # pragma: no cover - needs credentials
        import boto3

        client = boto3.client("s3")
    client.upload_file(local_path, bucket, key)
    return f"s3://{bucket}/{key}"
