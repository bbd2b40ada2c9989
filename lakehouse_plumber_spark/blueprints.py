"""Blueprints: reusable multi-flowgroup templates instantiated per instance.

Semantics mirror the reference (src/lhp/models/_blueprint.py:16-56,
src/lhp/core/processing/blueprint_expander.py:1-120):

- A *blueprint* declares ``parameters`` (name/required/default) and a list of
  flowgroup specs whose ``pipeline``/``flowgroup`` identity fields may contain
  ``%{var}`` placeholders.
- An *instance* (``use_blueprint:`` + ``parameters:``; legacy ``blueprint:`` +
  flat keys also accepted) provides concrete parameter values. Expansion is the
  cartesian product instances x blueprint.flowgroups.
- Only the identity fields (``pipeline``, ``flowgroup``) are resolved eagerly;
  every other ``%{var}`` stays intact and resolves later in the normal
  flowgroup-resolution pass (variables win precedence: spec-level ``variables``
  override instance parameters on key conflict, protecting blueprint-author
  derived state).
- ``${...}`` env/secret tokens are rejected inside identity fields (they only
  resolve after the expansion index is built).
- Duplicate resolved (pipeline, flowgroup) tuples across instances are an
  error at expansion time, with both offending instances cited.
"""

from __future__ import annotations

import copy
import re
from typing import Any, Mapping, Optional

from pydantic import BaseModel, ConfigDict, Field, model_validator

from lakehouse_plumber_spark.models import SpecError

_LOCAL = re.compile(r"%\{([A-Za-z0-9_.\-]+)\}")
_ENV_TOKEN = re.compile(r"\$\{[^}]+\}")


class BlueprintError(SpecError):
    pass


class BlueprintParameter(BaseModel):
    model_config = ConfigDict(extra="forbid")
    name: str
    required: bool = False
    default: Optional[Any] = None
    description: Optional[str] = None


class Blueprint(BaseModel):
    """A named collection of flowgroup specs parameterized by %{var}s."""

    model_config = ConfigDict(extra="forbid")
    name: str
    version: str = "1.0"
    description: Optional[str] = None
    parameters: list[BlueprintParameter] = Field(default_factory=list)
    flowgroups: list[dict[str, Any]]

    @model_validator(mode="after")
    def _check(self) -> "Blueprint":
        if not self.flowgroups:
            raise ValueError(f"blueprint {self.name!r} declares no flowgroups")
        for i, spec in enumerate(self.flowgroups):
            for field in ("pipeline", "flowgroup"):
                if not spec.get(field):
                    raise ValueError(
                        f"blueprint {self.name!r} flowgroups[{i}] missing {field!r}"
                    )
        return self


class BlueprintInstance(BaseModel):
    """Concrete parameter values for one blueprint instantiation.

    Accepts the preferred shape (``use_blueprint`` + nested ``parameters``)
    and the legacy shape (``blueprint`` + flat top-level keys); a before-mode
    validator normalizes both into the canonical form, and mixing them is an
    error — same contract as the reference's single normalization point.
    """

    model_config = ConfigDict(extra="forbid")
    use_blueprint: str
    parameters: dict[str, Any] = Field(default_factory=dict)
    source: Optional[str] = None  # provenance label for error messages

    @model_validator(mode="before")
    @classmethod
    def _normalize(cls, data: Any) -> Any:
        if not isinstance(data, dict):
            return data
        data = dict(data)
        legacy_name = data.pop("blueprint", None)
        if legacy_name is not None:
            if "use_blueprint" in data or "parameters" in data:
                raise ValueError(
                    "cannot mix legacy 'blueprint:' form with "
                    "'use_blueprint:'/'parameters:' in one instance"
                )
            params = {k: v for k, v in data.items() if k != "source"}
            return {
                "use_blueprint": legacy_name,
                "parameters": params,
                "source": data.get("source"),
            }
        return data


def looks_like_blueprint(spec: Mapping[str, Any]) -> bool:
    """A YAML doc is a blueprint iff it has `flowgroups` and no `actions`
    (reference _blueprint.py:46-48 keys on the same shape)."""
    return "flowgroups" in spec and "actions" not in spec


def looks_like_instance(spec: Mapping[str, Any]) -> bool:
    return "use_blueprint" in spec or "blueprint" in spec


def _effective_params(bp: Blueprint, inst: BlueprintInstance) -> dict[str, Any]:
    declared = {p.name: p for p in bp.parameters}
    unknown = set(inst.parameters) - set(declared)
    if unknown:
        raise BlueprintError(
            f"instance of blueprint {bp.name!r} passes undeclared parameter(s) "
            f"{sorted(unknown)} (declared: {sorted(declared)})"
        )
    out: dict[str, Any] = {}
    for name, p in declared.items():
        if name in inst.parameters:
            out[name] = inst.parameters[name]
        elif p.default is not None:
            out[name] = p.default
        elif not p.required:
            # omit undefaulted optional params entirely (reference
            # _effective_params does the same) so a %{var} using one fails
            # loudly as unresolved instead of rendering the string 'None'
            continue
        else:
            raise BlueprintError(
                f"instance of blueprint {bp.name!r} missing required parameter {name!r}"
                + (f" (from {inst.source})" if inst.source else "")
            )
    return out


def _resolve_identity(value: str, variables: Mapping[str, Any], *, field: str, bp: str) -> str:
    if _ENV_TOKEN.search(value):
        raise BlueprintError(
            f"blueprint {bp!r}: ${{...}} tokens are not allowed in {field!r} "
            f"(identity fields resolve before env substitution): {value!r}"
        )

    def repl(m: re.Match) -> str:
        name = m.group(1)
        if name not in variables or variables[name] is None:
            raise BlueprintError(
                f"blueprint {bp!r}: unresolved %{{{name}}} in {field!r}: {value!r}"
            )
        return str(variables[name])

    return _LOCAL.sub(repl, value)


def expand_blueprint(
    bp: Blueprint, instances: list[BlueprintInstance]
) -> list[dict[str, Any]]:
    """Expand instances x bp.flowgroups into raw flowgroup spec dicts.

    Each returned dict is ready for `parsers.load_flowgroup` — its `variables`
    block carries the merged parameter values so remaining %{var}s resolve in
    the normal pass.
    """
    out: list[dict[str, Any]] = []
    seen: dict[tuple[str, str], str] = {}
    for inst in instances:
        if inst.use_blueprint != bp.name:
            raise BlueprintError(
                f"instance references blueprint {inst.use_blueprint!r}, not {bp.name!r}"
            )
        params = _effective_params(bp, inst)
        for spec in bp.flowgroups:
            spec = copy.deepcopy(spec)
            # spec-level variables win over instance parameters (author-derived
            # state must not be silently clobbered by an instance)
            merged_vars = {**params, **(spec.get("variables") or {})}
            pipeline = _resolve_identity(
                str(spec["pipeline"]), merged_vars, field="pipeline", bp=bp.name
            )
            flowgroup = _resolve_identity(
                str(spec["flowgroup"]), merged_vars, field="flowgroup", bp=bp.name
            )
            key = (pipeline, flowgroup)
            origin = inst.source or "<instance>"
            if key in seen:
                raise BlueprintError(
                    f"duplicate (pipeline, flowgroup) {key} after expansion: "
                    f"produced by both {seen[key]} and {origin}"
                )
            seen[key] = origin
            spec["pipeline"] = pipeline
            spec["flowgroup"] = flowgroup
            spec["variables"] = merged_vars
            out.append(spec)
    return out


def expand_blueprints(
    blueprints: Mapping[str, Blueprint],
    instances: list[BlueprintInstance],
) -> list[dict[str, Any]]:
    """Expand many instances against a registry of blueprints, preserving
    cross-instance duplicate detection."""
    out: list[dict[str, Any]] = []
    seen: dict[tuple[str, str], str] = {}
    for inst in instances:
        if inst.use_blueprint not in blueprints:
            raise BlueprintError(
                f"instance references unknown blueprint {inst.use_blueprint!r} "
                f"(known: {sorted(blueprints)})"
            )
        for spec in expand_blueprint(blueprints[inst.use_blueprint], [inst]):
            key = (spec["pipeline"], spec["flowgroup"])
            origin = inst.source or "<instance>"
            if key in seen:
                raise BlueprintError(
                    f"duplicate (pipeline, flowgroup) {key} after expansion: "
                    f"produced by both {seen[key]} and {origin}"
                )
            seen[key] = origin
            out.append(spec)
    return out
