"""Object-store seam: S3 reads as distributed Spark scans.

Reference behavior being matched (not copied): ``get_object(Bucket,
Key)`` pulling a whole CSV into driver memory
(``src/services/s3_service.py:57-63``) — a shape that caps out at
single-node RAM.  The Spark-native replacement is the Hadoop S3A
connector: an ``s3a://bucket/key`` path handed to ``spark.read`` makes
the OBJECT STORE the distributed filesystem — ranged GETs per partition,
predicate/column pushdown intact, no driver staging.  Every reader in
this repo (``tables.load_table``, ``ingest.csv_reader``,
``sources.binary``) already takes a path, so S3 support is purely this
configuration seam plus URI normalization; none of their code changes.

This sandbox has no network and no hadoop-aws jars on the classpath, so
tests verify the configuration lands in the Hadoop conf and the URI
mapping is right — the same in-principle closure as the JDBC
ControlStore (``control/jdbc_store.py``).
"""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import SparkSession

#: True when boto3 is importable — the driver-side fetch seam.
HAS_BOTO3: bool = importlib.util.find_spec("boto3") is not None


def configure_s3a(
    spark: SparkSession,
    *,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style_access: bool = False,
    anonymous: bool = False,
) -> None:
    """Set the standard Hadoop S3A options on the active session.

    Only public hadoop-aws configuration keys; credentials default to the
    provider chain (env/instance profile) when not given explicitly.
    ``path_style_access`` is what MinIO/localstack-style endpoints need;
    ``anonymous`` selects the unauthenticated credentials provider for
    public buckets.
    """
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if endpoint is not None:
        conf.set("fs.s3a.endpoint", endpoint)
    if access_key is not None:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key is not None:
        conf.set("fs.s3a.secret.key", secret_key)
    if path_style_access:
        conf.set("fs.s3a.path.style.access", "true")
    if anonymous:
        conf.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider",
        )
    # Committer safety: never use the rename-based FileOutputCommitter v1
    # semantics against an object store (O(data) copies on commit); the
    # magic committer writes task output straight to the destination.
    conf.set("fs.s3a.committer.name", "magic")
    conf.set("fs.s3a.committer.magic.enabled", "true")


def to_spark_path(uri: str) -> str:
    """Normalize an object URI to the scheme Spark's Hadoop FS expects.

    ``s3://bucket/key`` (the AWS-CLI spelling the reference's job
    messages carry) maps to ``s3a://bucket/key``; everything else —
    s3a/gs/abfss/hdfs/file/local — passes through untouched.
    """
    if uri.startswith("s3://"):
        return "s3a://" + uri[len("s3://"):]
    return uri


def object_path(bucket: str, key: str) -> str:
    """(bucket, key) -> the Spark-readable path for that object."""
    return f"s3a://{bucket}/{key.lstrip('/')}"


class S3ObjectFetcher:
    """Driver-side object fetch for small CONTROL-PLANE files only.

    The reference stages every CSV through driver memory
    (``get_object`` at ``src/services/s3_service.py:57-63``); here that
    shape is reserved for what it is actually right for — kilobyte-scale
    job manifests/sidecar files — while data files go through S3A scans
    (above).  boto3-gated like the queue client; the wire protocol is
    pinned with botocore's Stubber in ``tests/test_connectors.py``.
    """

    def __init__(self, bucket: str, region: str | None = None):
        if not HAS_BOTO3:
            raise NotImplementedError(
                "S3ObjectFetcher needs boto3; pass local paths or use "
                "configure_s3a + spark.read for distributed scans"
            )
        import boto3

        self._s3 = boto3.client("s3", region_name=region)
        self.bucket = bucket

    def fetch_bytes(self, key: str) -> bytes:
        resp = self._s3.get_object(Bucket=self.bucket, Key=key)
        return resp["Body"].read()

    def fetch_to_file(self, key: str, dest_path: str) -> str:
        """Stage an object to a local path (atomic rename); returns the
        path, ready for ``ingest.csv_reader``/``spark.read``."""
        data = self.fetch_bytes(key)
        os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
        tmp = dest_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.rename(tmp, dest_path)
        return dest_path
