"""Token / variable / secret substitution for flowgroup specs.

Reference semantics (src/lhp/core/processing/substitution.py:42-45,238 and
src/lhp/core/processing/local_variables.py): ``${token}`` env substitutions,
``%{var}`` flowgroup-local variables, ``${secret:scope/key}`` secret refs.
In this OSS engine secrets resolve from environment variables
(``LHP_SECRET_<SCOPE>_<KEY>``) or a provided mapping — there is no dbutils.
"""

from __future__ import annotations

import os
import re
from typing import Any, Mapping, Optional

_TOKEN = re.compile(r"\$\{([A-Za-z0-9_.\-]+)\}")
_SECRET = re.compile(r"\$\{secret:([A-Za-z0-9_\-]+)/([A-Za-z0-9_\-]+)\}")
_LOCAL = re.compile(r"%\{([A-Za-z0-9_.\-]+)\}")


from lakehouse_plumber_spark.models import SpecError


class UnresolvedTokenError(SpecError):
    pass


def _sub_str(
    s: str,
    tokens: Mapping[str, Any],
    variables: Mapping[str, Any],
    secrets: Optional[Mapping[str, str]],
    strict: bool,
) -> str:
    def secret_repl(m: re.Match) -> str:
        scope, key = m.group(1), m.group(2)
        if secrets and f"{scope}/{key}" in secrets:
            return str(secrets[f"{scope}/{key}"])
        env_key = f"LHP_SECRET_{scope.upper()}_{key.upper()}"
        if env_key in os.environ:
            return os.environ[env_key]
        if strict:
            raise UnresolvedTokenError(f"unresolved secret ${{secret:{scope}/{key}}}")
        return m.group(0)

    def local_repl(m: re.Match) -> str:
        name = m.group(1)
        if name in variables:
            return str(variables[name])
        if strict:
            raise UnresolvedTokenError(f"unresolved local variable %{{{name}}}")
        return m.group(0)

    def token_repl(m: re.Match) -> str:
        name = m.group(1)
        if name in tokens:
            return str(tokens[name])
        if strict:
            raise UnresolvedTokenError(f"unresolved token ${{{name}}}")
        return m.group(0)

    s = _SECRET.sub(secret_repl, s)
    s = _LOCAL.sub(local_repl, s)
    s = _TOKEN.sub(token_repl, s)
    return s


def substitute(
    obj: Any,
    tokens: Optional[Mapping[str, Any]] = None,
    variables: Optional[Mapping[str, Any]] = None,
    secrets: Optional[Mapping[str, str]] = None,
    strict: bool = True,
) -> Any:
    """Recursively substitute tokens in any YAML-derived structure.

    Local ``%{var}`` first, then ``${token}``, with ``${secret:...}`` resolved
    before both. ``strict=True`` raises on unresolved refs (reference:
    flowgroup_resolver.py:164-188 unresolved-token validation).
    """
    tokens = tokens or {}
    variables = variables or {}
    if isinstance(obj, str):
        return _sub_str(obj, tokens, variables, secrets, strict)
    if isinstance(obj, dict):
        return {k: substitute(v, tokens, variables, secrets, strict) for k, v in obj.items()}
    if isinstance(obj, list):
        return [substitute(v, tokens, variables, secrets, strict) for v in obj]
    return obj
