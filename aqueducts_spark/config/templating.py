"""``${param}`` template substitution for pipeline documents.

Semantics follow the reference (aqueducts/core/src/templating.rs:250-282):
substitution is *textual* over the serialized document, applied before
typed parsing; any ``${name}`` left unresolved is a hard error listing
every missing name.
"""

from __future__ import annotations

import re

_PARAM_RE = re.compile(r"\$\{([A-Za-z0-9_.-]+)\}")


class MissingParamsError(ValueError):
    def __init__(self, names: list[str]):
        self.names = sorted(set(names))
        super().__init__(
            "missing template parameters: " + ", ".join(self.names)
        )


def substitute_params(text: str, params: dict[str, str] | None) -> str:
    """Replace every ``${name}`` with ``params[name]``.

    Raises :class:`MissingParamsError` listing all unresolved names.
    """
    params = params or {}
    missing: list[str] = []

    def repl(m: re.Match[str]) -> str:
        name = m.group(1)
        if name in params:
            return str(params[name])
        missing.append(name)
        return m.group(0)

    out = _PARAM_RE.sub(repl, text)
    if missing:
        raise MissingParamsError(missing)
    return out


def find_params(text: str) -> list[str]:
    """List parameter names referenced in a document."""
    return sorted({m.group(1) for m in _PARAM_RE.finditer(text)})
