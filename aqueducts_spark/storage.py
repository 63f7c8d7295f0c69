"""Object-store configuration -> Spark/Hadoop conf mapping.

The reference registers per-source object stores keyed by URL scheme
(aqueducts/core/src/store/mod.rs:93-202; s3.rs:50-114; gcs.rs:36-55;
azure.rs:48-98). Spark's Hadoop filesystem configuration is
session-global, so per-source configs are applied as *per-bucket*
settings where the connector supports them (``fs.s3a.bucket.<name>.*``)
and session-global otherwise — a documented difference.
"""

from __future__ import annotations

from urllib.parse import urlparse

# key names accepted in storage_config (subset of object_store's AWS/GCS/Azure
# keys that have Hadoop-connector equivalents)
_S3_KEY_MAP = {
    "aws_access_key_id": "access.key",
    "access_key_id": "access.key",
    "aws_secret_access_key": "secret.key",
    "secret_access_key": "secret.key",
    "aws_session_token": "session.token",
    "session_token": "session.token",
    "aws_region": "endpoint.region",
    "region": "endpoint.region",
    "aws_endpoint": "endpoint",
    "endpoint": "endpoint",
    "aws_allow_http": "connection.ssl.enabled",  # inverted below
    "allow_http": "connection.ssl.enabled",
}

_AZURE_KEY_MAP = {
    "azure_storage_account_name": "account_name",
    "account_name": "account_name",
    "azure_storage_account_key": "account_key",
    "account_key": "account_key",
}

_GCS_KEY_MAP = {
    "google_service_account": "fs.gs.auth.service.account.json.keyfile",
    "service_account_path": "fs.gs.auth.service.account.json.keyfile",
}


def apply_storage_config(spark, location: str, storage_config: dict[str, str]) -> None:
    """Apply a source/destination ``storage_config`` to the session's
    Hadoop configuration, scoped per-bucket when possible."""
    if not storage_config:
        return
    parsed = urlparse(location)
    scheme = parsed.scheme.lower()
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    if scheme in ("s3", "s3a"):
        bucket = parsed.netloc
        for key, value in storage_config.items():
            mapped = _S3_KEY_MAP.get(key.lower())
            if mapped is None:
                # passthrough: allow raw fs.s3a.* keys
                if key.startswith("fs."):
                    hconf.set(key, value)
                continue
            if mapped == "connection.ssl.enabled":
                value = "false" if str(value).lower() in ("true", "1") else "true"
            hconf.set(f"fs.s3a.bucket.{bucket}.{mapped}", value)
    elif scheme in ("gs", "gcs"):
        for key, value in storage_config.items():
            mapped = _GCS_KEY_MAP.get(key.lower(), key if key.startswith("fs.") else None)
            if mapped:
                hconf.set(mapped, value)
    elif scheme in ("az", "azure", "abfs", "abfss"):
        account = None
        for key, value in storage_config.items():
            if _AZURE_KEY_MAP.get(key.lower()) == "account_name":
                account = value
        if account is None and "@" in parsed.netloc:
            # infer from abfss://container@ACCOUNT.dfs.core.windows.net/...
            # (reference object_store does the same) — an account_key with
            # no account_name was previously dropped silently
            host = parsed.netloc.split("@", 1)[1]
            account = host.split(".", 1)[0] or None
        for key, value in storage_config.items():
            mapped = _AZURE_KEY_MAP.get(key.lower())
            if mapped == "account_key" and account:
                hconf.set(f"fs.azure.account.key.{account}.dfs.core.windows.net", value)
            elif key.startswith("fs."):
                hconf.set(key, value)
