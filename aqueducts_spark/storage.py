"""Object-store configuration -> Spark/Hadoop conf mapping.

The reference registers per-source object stores keyed by URL scheme
(aqueducts/core/src/store/mod.rs:93-202; s3.rs:50-114; gcs.rs:36-55;
azure.rs:48-98). Spark's Hadoop filesystem configuration is
session-global, so per-source configs are applied as *per-bucket*
settings where the connector supports them (``fs.s3a.bucket.<name>.*``)
and session-global otherwise — a documented difference.

Unrecognized keys raise: a silently-dropped credential key surfaces
hours later as an opaque 403 with no hint the config was ignored.
Raw ``fs.*`` keys always pass through verbatim for connector options
this map doesn't model.
"""

from __future__ import annotations

from urllib.parse import urlparse


class StorageConfigError(ValueError):
    pass


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

_AZURE_ACCOUNT_KEYS = {"azure_storage_account_name", "account_name"}
_AZURE_KEY_KEYS = {"azure_storage_account_key", "account_key"}
_AZURE_SAS_KEYS = {"azure_storage_sas_key", "azure_storage_sas_token", "sas_token"}
_AZURE_SP_KEYS = {
    "azure_client_id": "client_id",
    "client_id": "client_id",
    "azure_client_secret": "client_secret",
    "client_secret": "client_secret",
    "azure_tenant_id": "tenant_id",
    "tenant_id": "tenant_id",
}

_GCS_KEY_MAP = {
    "google_service_account": "fs.gs.auth.service.account.json.keyfile",
    "service_account_path": "fs.gs.auth.service.account.json.keyfile",
}


def _unknown(scheme: str, keys: list[str]) -> None:
    if keys:
        raise StorageConfigError(
            f"storage_config keys not understood for {scheme}: {sorted(keys)} "
            "(raw Hadoop options must be prefixed with 'fs.')"
        )


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
        unknown = []
        for key, value in storage_config.items():
            mapped = _S3_KEY_MAP.get(key.lower())
            if mapped is None:
                if key.startswith("fs."):
                    hconf.set(key, value)  # passthrough: raw fs.s3a.* keys
                else:
                    unknown.append(key)
                continue
            if mapped == "connection.ssl.enabled":
                value = "false" if str(value).lower() in ("true", "1") else "true"
            hconf.set(f"fs.s3a.bucket.{bucket}.{mapped}", value)
        _unknown("s3", unknown)
    elif scheme in ("gs", "gcs"):
        unknown = []
        for key, value in storage_config.items():
            mapped = _GCS_KEY_MAP.get(key.lower())
            if mapped:
                # the GCS connector has no per-bucket credential scoping
                # (unlike fs.s3a.bucket.<name>.*): a SECOND source with a
                # DIFFERENT keyfile would silently re-point the first
                # source's lazy reads at the wrong identity
                existing = hconf.get(mapped, None)
                if existing and existing != value:
                    raise StorageConfigError(
                        f"conflicting GCS credential for {mapped}: the "
                        f"connector configuration is session-global, so all "
                        f"gs:// sources in one pipeline must share it"
                    )
                hconf.set(mapped, value)
                # the keyfile property is consulted only under this auth
                # type (the connector default is COMPUTE_ENGINE /
                # APPLICATION_DEFAULT, which silently ignores it)
                hconf.set("fs.gs.auth.type", "SERVICE_ACCOUNT_JSON_KEYFILE")
            elif key.startswith("fs."):
                hconf.set(key, value)
            else:
                unknown.append(key)
        _unknown("gcs", unknown)
    elif scheme in ("az", "azure", "abfs", "abfss"):
        _apply_azure(hconf, parsed, storage_config)
    else:
        # file/hdfs/memory locations have no storage_config mapping —
        # silently ignoring the keys is exactly the "dropped credential
        # surfaces hours later as an opaque failure" this module's
        # fail-fast contract prevents
        raise StorageConfigError(
            f"storage_config is not supported for {scheme}:// locations "
            f"(got keys {sorted(storage_config)})"
        )


def _apply_azure(hconf, parsed, storage_config: dict[str, str]) -> None:
    # host = account.dfs.core.windows.net (or a sovereign-cloud /
    # custom endpoint) from the abfss authority; credentials register
    # under the ACTUAL host so non-default endpoints work
    from .location import _account_name_of

    host = None
    if "@" in parsed.netloc:
        host = parsed.netloc.split("@", 1)[1]
    # ONE implementation of account-name extraction (location.py's):
    # a second inline copy could drift on accepted keys
    account = _account_name_of(storage_config)
    if host is None and account is not None:
        host = f"{account}.dfs.core.windows.net"
    sp: dict[str, str] = {}
    unknown = []
    for key, value in storage_config.items():
        k = key.lower()
        if k in _AZURE_ACCOUNT_KEYS:
            continue  # consumed above (and by normalize_location)
        if k in _AZURE_KEY_KEYS:
            if host is None:
                raise StorageConfigError(
                    "azure account_key given but no storage account is known "
                    "(use an abfss://container@account... URL or set account_name)"
                )
            hconf.set(f"fs.azure.account.key.{host}", value)
        elif k in _AZURE_SAS_KEYS:
            if host is None:
                raise StorageConfigError(
                    "azure SAS token given but no storage account is known"
                )
            hconf.set(f"fs.azure.account.auth.type.{host}", "SAS")
            hconf.set(
                f"fs.azure.sas.token.provider.type.{host}",
                "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider",
            )
            hconf.set(f"fs.azure.sas.fixed.token.{host}", value)
        elif k in _AZURE_SP_KEYS:
            sp[_AZURE_SP_KEYS[k]] = value
        elif key.startswith("fs."):
            hconf.set(key, value)
        else:
            unknown.append(key)
    if sp:
        missing = {"client_id", "client_secret", "tenant_id"} - set(sp)
        if missing:
            raise StorageConfigError(
                f"azure service-principal auth needs client_id + client_secret "
                f"+ tenant_id (missing: {sorted(missing)})"
            )
        if host is None:
            raise StorageConfigError(
                "azure service-principal auth given but no storage account is known"
            )
        hconf.set(f"fs.azure.account.auth.type.{host}", "OAuth")
        hconf.set(
            f"fs.azure.account.oauth.provider.type.{host}",
            "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider",
        )
        hconf.set(f"fs.azure.account.oauth2.client.id.{host}", sp["client_id"])
        hconf.set(f"fs.azure.account.oauth2.client.secret.{host}", sp["client_secret"])
        hconf.set(
            f"fs.azure.account.oauth2.client.endpoint.{host}",
            f"https://login.microsoftonline.com/{sp['tenant_id']}/oauth2/token",
        )
    _unknown("azure", unknown)
