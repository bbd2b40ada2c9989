"""YAML flowgroup parsing: discovery, presets, templates, substitution.

Pipeline mirrors the reference's resolution order
(src/lhp/core/processing/flowgroup_resolver.py:66-253): local %{var}
variables -> Jinja template expansion -> preset deep-merge chain -> ${token}
substitution -> validation.
"""

from __future__ import annotations

import copy
import glob
import os
from typing import Any, Mapping, Optional

import yaml
from pydantic import ValidationError as PydanticValidationError

from lakehouse_plumber_spark.dag import validate_flowgroup_graph
from lakehouse_plumber_spark.models import FlowGroup, SpecError
from lakehouse_plumber_spark.substitution import substitute


def deep_merge(base: dict, override: dict) -> dict:
    """Preset deep-merge (reference flowgroup_resolver.py:255-312): dicts merge
    recursively, scalars/lists in the override win."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _load_presets(preset_names: list[str], presets_dir: Optional[str]) -> dict:
    merged: dict = {}
    for name in preset_names:
        if not presets_dir:
            raise SpecError(f"preset {name!r} requested but no presets_dir given")
        path = os.path.join(presets_dir, f"{name}.yaml")
        try:
            with open(path) as f:
                preset = yaml.safe_load(f) or {}
        except FileNotFoundError as e:
            raise SpecError(f"preset {name!r}: file not found: {path}") from e
        # presets may themselves extend other presets
        parent = preset.pop("extends", None)
        if parent:
            merged = deep_merge(merged, _load_presets([parent], presets_dir))
        merged = deep_merge(merged, preset.get("defaults", preset))
    return merged


def _extract_parameters_block(raw: str) -> list:
    """Pull the top-level `parameters:` block out of a template whose full
    text is not valid YAML (unquoted Jinja scalars elsewhere). The block
    spans from the `parameters:` line to the next unindented key."""
    lines = raw.splitlines()
    start = None
    for i, ln in enumerate(lines):
        if ln.startswith("parameters:"):
            start = i
            break
    if start is None:
        return []
    block = [lines[start]]
    for ln in lines[start + 1:]:
        # the block ends at the next top-level KEY or a document separator;
        # zero-indent sequence items ("- name: x") and comments belong to
        # the block
        if ln.startswith("---"):
            break
        if ln and not ln[0].isspace() and not ln.lstrip().startswith(("-", "#")):
            break
        block.append(ln)
    try:
        parsed = yaml.safe_load("\n".join(block)) or {}
    except yaml.YAMLError:
        return []
    decl = parsed.get("parameters")
    return decl if isinstance(decl, list) else []


def _expand_template(
    spec: dict, templates_dir: Optional[str], params: Mapping[str, Any]
) -> dict:
    """`use_template` expansion via Jinja2 (reference template_engine.py)."""
    name = spec.get("use_template")
    if not name:
        return spec
    if not templates_dir:
        raise SpecError(f"template {name!r} requested but no templates_dir given")
    import jinja2

    path = os.path.join(templates_dir, f"{name}.yaml")
    try:
        with open(path) as f:
            raw = f.read()
    except FileNotFoundError as e:
        raise SpecError(f"template {name!r}: file not found: {path}") from e
    # the template's own `parameters:` block declares defaults and required
    # params (reference template_engine.py:106,129-155: defaults applied,
    # missing required -> clean error, BEFORE rendering). A full YAML
    # pre-parse fails for any template with an unquoted `{{ x }}` scalar —
    # the common case — so when it does, fall back to parsing just the
    # top-level `parameters:` block textually (its declarations are plain
    # YAML by construction; only values elsewhere carry Jinja).
    final_params = dict(params)
    try:
        pre = yaml.safe_load(raw) or {}
    except yaml.YAMLError:
        pre = {"parameters": _extract_parameters_block(raw)}
    declared = pre.get("parameters") if isinstance(pre, dict) else None
    if isinstance(declared, list):
        missing = []
        for p in declared:
            if not isinstance(p, dict) or "name" not in p:
                continue
            if p["name"] in final_params:
                continue
            if "default" in p:
                final_params[p["name"]] = p["default"]
            elif p.get("required", False):
                missing.append(p["name"])
        if missing:
            raise SpecError(
                f"template {name!r}: missing required parameters {sorted(missing)}"
            )
    try:
        rendered = jinja2.Template(raw, undefined=jinja2.StrictUndefined).render(
            **final_params
        )
    except (jinja2.UndefinedError, jinja2.TemplateSyntaxError) as e:
        # StrictUndefined and syntax failures become the same clean spec
        # error the declared-parameter check raises (not a raw Jinja
        # traceback) so `validate` reports a FAIL line
        raise SpecError(f"template {name!r}: {getattr(e, 'message', None) or e}") from e
    template = yaml.safe_load(rendered) or {}
    merged = deep_merge({k: v for k, v in template.items() if k != "parameters"}, spec)
    merged.pop("use_template", None)
    merged.pop("template_parameters", None)
    return merged


def _expand_variable_definitions(variables: dict) -> dict:
    """Variables may reference other variables; expand definitions to a fixed
    point (reference local_variables.py:35-58, 10-iteration circularity cap)."""
    out = dict(variables)
    for _ in range(10):
        changed = False
        for name, value in out.items():
            if isinstance(value, str) and "%{" in value:
                new = substitute(value, variables=out, strict=False)
                if new != value:
                    out[name] = new
                    changed = True
        if not changed:
            return out
    raise SpecError(
        "variable expansion did not converge in 10 iterations "
        f"(likely circular reference among {sorted(out)})"
    )


def load_flowgroup(
    spec: dict,
    tokens: Optional[Mapping[str, Any]] = None,
    secrets: Optional[Mapping[str, str]] = None,
    presets_dir: Optional[str] = None,
    templates_dir: Optional[str] = None,
    validate: bool = True,
) -> FlowGroup:
    """Resolve a raw YAML dict into a validated FlowGroup model."""
    spec = copy.deepcopy(spec)
    spec = _expand_template(spec, templates_dir, spec.get("template_parameters", {}) or {})
    preset_defaults = _load_presets(spec.get("presets", []) or [], presets_dir)
    if preset_defaults:
        # presets provide defaults under the flowgroup (actions keep their own fields)
        spec = deep_merge(preset_defaults, spec)
    # %{var} resolution sees the MERGED variable set — template- and
    # preset-provided variables are referenceable, with the flowgroup's own
    # declarations winning (deep_merge puts spec over preset defaults)
    variables = _expand_variable_definitions(spec.get("variables", {}) or {})
    spec = substitute(spec, tokens=tokens or {}, variables=variables, secrets=secrets)
    try:
        fg = FlowGroup.model_validate(spec)
    except PydanticValidationError as e:
        # user-authored spec defects report as spec errors, not tracebacks
        raise SpecError(str(e)) from e
    if validate:
        validate_flowgroup_graph(fg.actions)
    return fg


def load_flowgroup_file(
    path: str,
    tokens: Optional[Mapping[str, Any]] = None,
    secrets: Optional[Mapping[str, str]] = None,
    presets_dir: Optional[str] = None,
    templates_dir: Optional[str] = None,
) -> FlowGroup:
    with open(path) as f:
        spec = yaml.safe_load(f)
    base = os.path.dirname(os.path.abspath(path))
    return load_flowgroup(
        spec,
        tokens=tokens,
        secrets=secrets,
        presets_dir=presets_dir or _find_dir(base, "presets"),
        templates_dir=templates_dir or _find_dir(base, "templates"),
    )


_project_config_cache: dict[tuple, object] = {}


def load_project_config(project_root: str):
    """Read lhp.yaml at the project root, or None when absent (reference
    ProjectConfig, src/lhp/models/_project.py). Defects are SpecErrors.
    Cached on (path, mtime): one CLI invocation touches this up to three
    times (discovery, sandbox policy, runner wiring)."""
    from lakehouse_plumber_spark.models import ProjectConfig

    path = os.path.join(project_root, "lhp.yaml")
    if not os.path.exists(path):
        return None
    import hashlib

    with open(path, "rb") as f:
        raw = f.read()
    # content-hash key (not mtime: coarse filesystem timestamps would serve
    # a stale config after a same-second rewrite)
    key = hashlib.sha256(raw).hexdigest()
    if key in _project_config_cache:
        return _project_config_cache[key]
    try:
        spec = yaml.safe_load(raw) or {}
    except yaml.YAMLError as e:
        raise SpecError(f"lhp.yaml: {e}") from e
    try:
        cfg = ProjectConfig.model_validate(spec)
    except PydanticValidationError as e:
        raise SpecError(f"lhp.yaml: {e}") from e
    _project_config_cache.clear()  # keep exactly one entry (tests mutate files)
    _project_config_cache[key] = cfg
    return cfg


def discover_flowgroups(
    project_root: str,
    tokens: Optional[Mapping[str, Any]] = None,
    include: Optional[list[str]] = None,
) -> list[FlowGroup]:
    """Scan `pipelines/**/*.yaml` honoring include globs
    (reference: src/lhp/core/discovery/flowgroup_discoverer.py).

    Files under the scan may be regular flowgroups, blueprint definitions, or
    blueprint instances; blueprints may also live in a sibling `blueprints/`
    directory. Instances expand to synthetic flowgroups before resolution
    (reference: src/lhp/core/processing/blueprint_expander.py).
    """
    from lakehouse_plumber_spark.blueprints import (
        Blueprint,
        BlueprintInstance,
        expand_blueprints,
        looks_like_blueprint,
        looks_like_instance,
    )

    project_cfg = load_project_config(project_root)
    if include is None and project_cfg is not None and project_cfg.include:
        # lhp.yaml include globs scope discovery, relative to pipelines/
        # (reference flowgroup_discoverer honors ProjectConfig.include)
        include = [os.path.join("pipelines", pat) for pat in project_cfg.include]
    patterns = include or ["pipelines/**/*.yaml", "pipelines/**/*.yml"]
    paths: list[str] = []
    for pat in patterns:
        paths.extend(
            p for p in glob.glob(os.path.join(project_root, pat), recursive=True)
            # include globs like "one/**" also match directories and
            # non-YAML files; discovery only reads flowgroup YAML
            if os.path.isfile(p) and p.endswith((".yaml", ".yml"))
        )
    bp_dir = _find_dir(project_root, "blueprints")
    bp_paths = sorted(glob.glob(os.path.join(bp_dir, "*.yaml"))) if bp_dir else []

    presets_dir = _find_dir(project_root, "presets")
    templates_dir = _find_dir(project_root, "templates")
    blueprints: dict[str, Blueprint] = {}
    instances: list[BlueprintInstance] = []
    out: list[FlowGroup] = []

    def _classify(path: str, spec: dict) -> Optional[FlowGroup]:
        try:
            if looks_like_blueprint(spec):
                bp = Blueprint.model_validate(spec)
                blueprints[bp.name] = bp
                return None
            if looks_like_instance(spec):
                inst = BlueprintInstance.model_validate({**spec, "source": path})
                instances.append(inst)
                return None
        except PydanticValidationError as e:
            raise SpecError(f"{path}: {e}") from e
        return load_flowgroup(
            spec, tokens=tokens, presets_dir=presets_dir, templates_dir=templates_dir
        )

    from lakehouse_plumber_spark.parse_cache import cache_for

    cache = cache_for(project_root)

    def _read_yaml(p: str) -> dict:
        try:
            if cache is not None:
                return cache.load_yaml(p) or {}
            with open(p) as f:
                return yaml.safe_load(f) or {}
        except yaml.YAMLError as e:
            # malformed user YAML is a spec defect, not an engine traceback
            raise SpecError(f"{p}: {e}") from e

    for p in bp_paths:
        try:
            bp = Blueprint.model_validate(_read_yaml(p))
        except PydanticValidationError as e:
            raise SpecError(f"{p}: {e}") from e
        blueprints[bp.name] = bp
    for p in sorted(set(paths)):
        fg = _classify(p, _read_yaml(p))
        if fg is not None:
            out.append(fg)
    for synthetic in expand_blueprints(blueprints, instances):
        out.append(
            load_flowgroup(
                synthetic,
                tokens=tokens,
                presets_dir=presets_dir,
                templates_dir=templates_dir,
            )
        )
    return out


def _find_dir(root: str, name: str) -> Optional[str]:
    cur = root
    for _ in range(6):
        cand = os.path.join(cur, name)
        if os.path.isdir(cand):
            return cand
        nxt = os.path.dirname(cur)
        if nxt == cur:
            break
        cur = nxt
    return None
