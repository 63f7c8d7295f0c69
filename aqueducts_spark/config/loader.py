"""Load pipeline documents from YAML / JSON / TOML.

Mirrors the reference's load path (aqueducts/core/src/templating.rs:350-545):
read text -> ``${param}`` substitution -> format parse by extension ->
typed validation -> load-time SQL pre-validation of every stage query.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import yaml

from .model import Pipeline
from .templating import substitute_params
from ..sql_guard import validate_stage_sql


class ConfigError(ValueError):
    pass


def _parse_text(text: str, fmt: str) -> dict[str, Any]:
    if fmt == "yaml":
        return yaml.safe_load(text)
    if fmt == "json":
        return json.loads(text)
    if fmt == "toml":
        import tomllib

        return tomllib.loads(text)
    raise ConfigError(f"unsupported config format: {fmt}")


def format_from_path(path: str | Path) -> str:
    suffix = Path(path).suffix.lower()
    fmt = {".yml": "yaml", ".yaml": "yaml", ".json": "json", ".toml": "toml"}.get(suffix)
    if fmt is None:
        raise ConfigError(f"cannot infer config format from extension: {path}")
    return fmt


def load_pipeline_str(
    text: str, fmt: str = "yaml", params: dict[str, str] | None = None,
    validate_sql: bool = True, substitute: bool = True,
) -> Pipeline:
    # substitute=False: the text was already templated (remote executor
    # submissions — the CLIENT substitutes, reference remote CLI
    # semantics); running substitution again would flag any literal
    # ${...} that a param VALUE legitimately injected
    substituted = substitute_params(text, params) if substitute else text
    raw = _parse_text(substituted, fmt)
    if not isinstance(raw, dict):
        raise ConfigError("pipeline document must be a mapping")
    pipeline = Pipeline.model_validate(raw)
    if validate_sql:
        for group in pipeline.stage_groups:
            for stage in group:
                if stage.query is not None:
                    validate_stage_sql(stage.query, stage_name=stage.name)
    return pipeline


def load_pipeline(
    path: str | Path, params: dict[str, str] | None = None, validate_sql: bool = True
) -> Pipeline:
    path = Path(path)
    return load_pipeline_str(
        path.read_text(encoding="utf-8"), format_from_path(path), params, validate_sql
    )
