"""SDK-level object-store access (S5/K4 companion).

The preferred object-storage path is Spark's own s3a filesystem —
``sinks.configure_s3`` + ``spark.read.parquet("s3a://...")`` — which
streams directly from the store with partition pruning and needs no
SDK. When the hadoop-aws jars are absent from the runtime (as in this
container; see PARITY.md "S5/K4 env-blocked"), this module provides
the same capability at the boto3 layer, mirroring the reference's own
SDK usage (reference usgs_tsunami_fact_silver_object_storage.py:65-81
builds a boto3 client against a custom endpoint and lists bucket
objects; save_to_raw_delta_prod.py:82-89 passes identical
endpoint/credential config as storage_options):

- :func:`make_client` — endpoint/credential wiring, the boto3 twin of
  ``configure_s3``'s four ``fs.s3a.*`` keys.
- :func:`upload_table` / :func:`download_table` — sync a local
  parquet table directory against a bucket prefix.
- :func:`list_prefix` — object listing (S7's SDK-level counterpart).
- :func:`read_table_staged` — download-then-read: the documented
  fallback that keeps object-store tables usable without the s3a jars.

Scale note: the staged path copies the table once and is meant for
dim-sized tables or jar-less dev environments; fact-table scans at
100 TB belong on s3a/native cloud connectors where Spark reads ranges
directly and prunes partitions server-side. ``upload_table`` walks the
local directory only (driver-side metadata, not data-sized state).

boto3 is import-gated: everything raises a clear error when the SDK
is missing rather than at import time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - environment probe
    import boto3

    BOTO3_AVAILABLE = True
except Exception:  # pragma: no cover
    boto3 = None  # type: ignore[assignment]
    BOTO3_AVAILABLE = False


def _require_boto3() -> None:
    if not BOTO3_AVAILABLE:
        raise RuntimeError(
            "boto3 is not installed; install it or use the s3a path "
            "(sinks.configure_s3) instead"
        )


def make_client(
    endpoint: str,
    access_key: str,
    secret_key: str,
    region: str = "us-east-1",
):
    """Build an S3 client against an S3-compatible endpoint — the same
    (endpoint, access, secret, path-style) quadruple ``configure_s3``
    sets for s3a, so credentials live in exactly one shape."""
    _require_boto3()
    session = boto3.session.Session()
    return session.client(
        "s3",
        region_name=region,
        endpoint_url=endpoint,
        aws_access_key_id=access_key,
        aws_secret_access_key=secret_key,
    )


def list_prefix(client, bucket: str, prefix: str) -> list[tuple[str, int]]:
    """List (key, size) under a prefix. Paginates — a 100 TB table's
    file listing never fits one ListObjectsV2 page."""
    out: list[tuple[str, int]] = []
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
        for obj in page.get("Contents", []):
            out.append((obj["Key"], obj["Size"]))
    return out


def upload_table(client, local_dir: str, bucket: str, prefix: str) -> int:
    """Upload every data file under ``local_dir`` (a Spark table
    directory: parquet parts, partition subdirs) to
    ``bucket/prefix/...`` preserving relative layout. Skips Spark's
    ``_SUCCESS``/``.crc`` bookkeeping. Returns the file count."""
    n = 0
    for root, _dirs, files in os.walk(local_dir):
        for fname in files:
            if fname == "_SUCCESS" or fname.endswith(".crc"):
                continue
            full = os.path.join(root, fname)
            rel = os.path.relpath(full, local_dir)
            key = f"{prefix.rstrip('/')}/{rel.replace(os.sep, '/')}"
            client.upload_file(full, bucket, key)
            n += 1
    return n


def download_table(client, bucket: str, prefix: str, local_dir: str) -> int:
    """Mirror ``bucket/prefix`` into ``local_dir`` preserving relative
    layout (partition directories survive, so partition pruning still
    works on the staged copy). Returns the file count."""
    pfx = prefix.rstrip("/") + "/"
    n = 0
    for key, _size in list_prefix(client, bucket, pfx):
        rel = key[len(pfx):]
        if not rel:
            continue
        dest = os.path.join(local_dir, rel.replace("/", os.sep))
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        client.download_file(bucket, key, dest)
        n += 1
    return n


def read_table_staged(
    spark: SparkSession,
    client,
    bucket: str,
    prefix: str,
    staging_dir: str,
) -> DataFrame:
    """Object-store table -> DataFrame without s3a jars: stage the
    table locally, then ``spark.read.parquet`` it (partition-dir
    layout intact, so Catalyst still prunes partitions/columns)."""
    if download_table(client, bucket, prefix, staging_dir) == 0:
        raise FileNotFoundError(f"no objects under s3://{bucket}/{prefix}")
    return spark.read.parquet(staging_dir)
