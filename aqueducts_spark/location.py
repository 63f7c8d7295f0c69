"""Location handling (reference: aqueducts/schemas/src/location.rs:34-83,
scheme list aqueducts/core/src/store/mod.rs:14-20).

Bare paths (absolute or relative) are coerced to ``file://`` URLs.
Cloud schemes are normalized to the Hadoop connector each one maps to on
Spark: ``s3``/``s3a`` -> ``s3a``, ``gs``/``gcs`` -> ``gs``,
``az``/``azure``/``abfs``/``abfss`` -> ``abfss``.

Azure short form: ``az://container/path`` has no storage account in the
authority, but the ABFS connector requires
``abfss://container@account.dfs.core.windows.net/path`` — pass the
``account_name`` from the source/destination ``storage_config`` to
:func:`normalize_location` and the authority is rebuilt; without it the
short form is refused with a clear error instead of producing an
invalid URL.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Optional
from urllib.parse import unquote, urlparse

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:(//|/)")

SUPPORTED_SCHEMES = {
    "file", "memory", "s3", "s3a", "gs", "gcs", "az", "azure", "abfs", "abfss",
    "hdfs",
}

_SPARK_SCHEME = {
    "s3": "s3a",
    "s3a": "s3a",
    "gs": "gs",
    "gcs": "gs",
    "az": "abfss",
    "azure": "abfss",
    "abfs": "abfs",
    "abfss": "abfss",
    "file": "file",
    "hdfs": "hdfs",
    "memory": "memory",
}

_AZURE_DEFAULT_SUFFIX = "dfs.core.windows.net"


class LocationError(ValueError):
    pass


def _account_name_of(storage_config: Optional[dict]) -> Optional[str]:
    for key in ("account_name", "azure_storage_account_name"):
        for k, v in (storage_config or {}).items():
            if k.lower() == key:
                return str(v)
    return None


def normalize_location(
    location: str, storage_config: Optional[dict] = None
) -> str:
    """Return a URL Spark's DataFrame reader/writer understands."""
    location = str(location).strip()
    if not location:
        raise LocationError("empty location")
    if not _SCHEME_RE.match(location):
        # bare path -> absolute file:// URL (reference location.rs:34-58)
        if any(ch in location for ch in "*?[]"):
            # glob pattern (streaming sources take globs): as_uri()
            # percent-encodes the glob characters and Spark would then
            # look for a literal '%2A' file — build the URI unquoted
            # (the glob is resolved by Hadoop's globber, not the OS)
            return "file://" + str(Path(location).absolute())
        uri = Path(location).absolute().as_uri()
        if uri == "file:///":
            return uri  # rstrip would eat the filesystem root to 'file:/'
        return uri.rstrip("/") + ("/" if location.endswith("/") else "")
    parsed = urlparse(location)
    scheme = parsed.scheme.lower()
    if scheme not in SUPPORTED_SCHEMES:
        raise LocationError(
            f"unsupported location scheme '{scheme}' "
            f"(supported: {sorted(SUPPORTED_SCHEMES)})"
        )
    if not location[len(scheme):].startswith("://"):
        # single-slash form ('file:/tmp/x', the rendering Spark itself
        # prints) — normalize to the canonical form.  Only object-store
        # schemes hoist the first segment into the authority (it IS the
        # bucket/container); for file/hdfs the whole remainder is a
        # PATH — 'hdfs:/user/x' must not turn 'user' into a namenode
        # hostname
        rest = location[len(scheme) + 1 :].lstrip("/")
        if scheme in ("file", "hdfs", "memory"):
            location = f"{scheme}:///{rest}"
        else:
            location = f"{scheme}://{rest}"
        parsed = urlparse(location)
    spark_scheme = _SPARK_SCHEME[scheme]
    if spark_scheme in ("abfss", "abfs") and "@" not in parsed.netloc:
        # az://container/path short form: rebuild the required
        # container@account authority from storage_config.account_name
        account = _account_name_of(storage_config)
        if not account:
            raise LocationError(
                f"azure location '{location}' has no storage account in its "
                "authority — use abfss://container@account.dfs.core.windows.net/"
                "path, or provide storage_config.account_name with the "
                "az://container/path short form"
            )
        container = parsed.netloc
        path = parsed.path
        return f"abfss://{container}@{account}.{_AZURE_DEFAULT_SUFFIX}{path}"
    if spark_scheme == scheme:
        return location
    return spark_scheme + location[len(scheme):]


def to_local_path(location: str) -> Path:
    """Convert a file:// URL (or bare path) to a local Path.

    Percent-escapes are decoded: ``Path.as_uri`` encodes spaces & co,
    and returning the encoded form verbatim would point the Python side
    (delta log, single-file renames) at a different directory than the
    one Spark writes."""
    url = normalize_location(location)
    parsed = urlparse(url)
    if parsed.scheme != "file":
        raise LocationError(f"not a local file location: {location}")
    return Path(unquote(parsed.path))


def is_local(location: str) -> bool:
    return urlparse(normalize_location(location)).scheme == "file"
