"""Location handling (reference: aqueducts/schemas/src/location.rs:34-83,
scheme list aqueducts/core/src/store/mod.rs:14-20).

Bare paths (absolute or relative) are coerced to ``file://`` URLs.
Cloud schemes are normalized to the Hadoop connector each one maps to on
Spark: ``s3``/``s3a`` -> ``s3a``, ``gs``/``gcs`` -> ``gs``,
``az``/``azure``/``abfs``/``abfss`` -> ``abfss``.
"""

from __future__ import annotations

import re
from pathlib import Path
from urllib.parse import urlparse

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")

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


class LocationError(ValueError):
    pass


def normalize_location(location: str) -> str:
    """Return a URL Spark's DataFrame reader/writer understands."""
    location = str(location).strip()
    if not location:
        raise LocationError("empty location")
    if not _SCHEME_RE.match(location):
        # bare path -> absolute file:// URL (reference location.rs:34-58)
        return Path(location).absolute().as_uri().rstrip("/") + (
            "/" if location.endswith("/") else ""
        )
    parsed = urlparse(location)
    scheme = parsed.scheme.lower()
    if scheme not in SUPPORTED_SCHEMES:
        raise LocationError(
            f"unsupported location scheme '{scheme}' "
            f"(supported: {sorted(SUPPORTED_SCHEMES)})"
        )
    spark_scheme = _SPARK_SCHEME[scheme]
    if spark_scheme == scheme:
        return location
    return spark_scheme + location[len(scheme):]


def to_local_path(location: str) -> Path:
    """Convert a file:// URL (or bare path) to a local Path."""
    url = normalize_location(location)
    parsed = urlparse(url)
    if parsed.scheme != "file":
        raise LocationError(f"not a local file location: {location}")
    return Path(parsed.path)


def is_local(location: str) -> bool:
    return urlparse(normalize_location(location)).scheme == "file"
