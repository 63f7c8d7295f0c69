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
    # any ${...} in the DOCUMENT whose name the strict pattern did not
    # match ('${ y }', '${data dir}') is a typo'd placeholder, not
    # literal text — the documented contract is that every unresolved
    # ${...} is a hard error, not a string that flows into a
    # location/query verbatim.  Scanned on the ORIGINAL text: PARAM
    # VALUES may legitimately contain template-looking syntax
    # (reference semantics; the executor client pre-substitutes for
    # exactly this reason).
    stray = [
        m.group(0)
        for m in re.finditer(r"\$\{[^}]*\}", text)
        if not _PARAM_RE.fullmatch(m.group(0))
    ]
    if stray:
        missing.extend(sorted(set(stray)))
    if missing:
        raise MissingParamsError(missing)
    return out


def find_params(text: str) -> list[str]:
    """List parameter names referenced in a document."""
    return sorted({m.group(1) for m in _PARAM_RE.finditer(text)})
