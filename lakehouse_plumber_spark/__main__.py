"""CLI for the engine — the OSS counterpart of the reference's `lhp` tool
(reference: src/lhp/cli/main.py lazy-registers generate/validate/deps/...).

Because this engine executes pipelines instead of emitting Databricks code,
`lhp generate` maps to two commands here:

  python -m lakehouse_plumber_spark validate <project_root> [--env dev]
  python -m lakehouse_plumber_spark run      <project_root> [--env dev]
  python -m lakehouse_plumber_spark compile  <project_root> [-o OUT] [--env dev]
  python -m lakehouse_plumber_spark deps     <project_root> [--env dev]

Project layout mirrors the reference: `pipelines/**/*.yaml` flowgroups (plus
`presets/`, `templates/`, `blueprints/`), and token files under
`substitutions/{env}.yaml` (reference: src/lhp/core/processing/substitution.py;
secrets come from LHP_SECRET_<SCOPE>_<KEY> env vars in this engine).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_tokens(project_root: str, env: str | None) -> dict:
    if not env:
        return {}
    import yaml

    path = os.path.join(project_root, "substitutions", f"{env}.yaml")
    if not os.path.exists(path):
        raise SystemExit(f"no substitution file for env {env!r}: {path}")
    with open(path) as f:
        spec = yaml.safe_load(f) or {}
    # reference env files may nest under the env name or be flat
    return spec.get(env, spec)


def _discover(args) -> list:
    from lakehouse_plumber_spark.parsers import discover_flowgroups

    fgs = discover_flowgroups(args.project_root, tokens=_load_tokens(args.project_root, args.env))
    if not fgs:
        raise SystemExit(f"no flowgroups under {args.project_root}/pipelines/")
    if getattr(args, "sandbox", None):
        # per-developer rename pass (reference --sandbox, core/sandbox/):
        # every produced table and every read of it gets the namespace prefix
        from lakehouse_plumber_spark.sandbox import SandboxConfigError, apply_sandbox

        try:
            fgs = apply_sandbox(fgs, args.sandbox)
        except SandboxConfigError as e:
            raise SystemExit(f"bad --sandbox config: {e}")
    return fgs


def cmd_validate(args) -> int:
    from lakehouse_plumber_spark.dag import CycleError, ValidationError, validate_flowgroup_graph

    try:
        fgs = _discover(args)
    except (CycleError, ValidationError) as e:
        print(f"FAIL  {e}")
        return 1
    rc = 0
    for fg in fgs:
        label = f"{fg.pipeline}/{fg.flowgroup}"
        try:
            warnings = validate_flowgroup_graph(fg.actions)
        except ValidationError as e:
            print(f"FAIL  {label}: {e}")
            rc = 1
            continue
        print(f"ok    {label} ({len(fg.actions)} actions)")
        for w in warnings:
            print(f"  warn: {w}")
    return rc


def cmd_run(args) -> int:
    from lakehouse_plumber_spark import get_spark
    from lakehouse_plumber_spark.runner import PipelineRunner

    fgs = _discover(args)
    spark = get_spark("lhp_cli")
    spark.sparkContext.setLogLevel("WARN")
    runner = PipelineRunner(spark, base_dir=args.project_root)
    from lakehouse_plumber_spark.models import ActionType

    contexts = runner.run_many(fgs)
    for fg, ctx in zip(fgs, contexts):
        for a in fg.actions:
            if (
                a.type == ActionType.WRITE
                and a.write_target is not None
                and a.write_target.type.value in ("streaming_table", "materialized_view")
            ):
                name = a.write_target.full_name
                n = ctx.resolve_view(name).count()
                print(f"{fg.pipeline}/{fg.flowgroup}: {name} rows={n}")
    log = runner.event_log_df()
    summary = {
        r["event"]: r["n"]
        for r in log.groupBy("event").count().withColumnRenamed("count", "n").collect()
    }
    print(f"event log: {json.dumps(summary, sort_keys=True)}")
    return 0


def cmd_compile(args) -> int:
    from lakehouse_plumber_spark.codegen import compile_flowgroup

    os.makedirs(args.out, exist_ok=True)
    rc = 0
    for fg in _discover(args):
        dest = os.path.join(args.out, f"{fg.pipeline}__{fg.flowgroup}.py")
        try:
            src = compile_flowgroup(fg, base_dir=args.project_root)
        except NotImplementedError as e:
            print(f"skip  {fg.pipeline}/{fg.flowgroup}: {e}")
            rc = 2
            continue
        with open(dest, "w") as f:
            f.write(src)
        print(f"wrote {dest}")
    return rc


def _build_dep_edges(fgs: list, base_dir: str) -> dict:
    """Cross-flowgroup edges + carried advisories, JSON-serializable so the
    graph cache (reference graph_cache.py) can persist it."""
    from lakehouse_plumber_spark.models import ActionType
    from lakehouse_plumber_spark.dag import sql_table_refs
    from lakehouse_plumber_spark.pydeps import action_python_refs

    writes: dict[str, int] = {}
    for i, fg in enumerate(fgs):
        for a in fg.actions:
            if a.type == ActionType.WRITE and a.write_target is not None:
                writes[a.write_target.full_name] = i
                if a.write_target.table:
                    writes[a.write_target.table] = i
    deps: dict[int, set[int]] = {i: set() for i in range(len(fgs))}
    warnings: list[str] = []
    for i, fg in enumerate(fgs):
        for a in fg.actions:
            refs = list(a.source_views())
            sql = a.sql or (a.source.get("sql") if isinstance(a.source, dict) else None)
            if sql:
                refs.extend(sql_table_refs(sql))
            if a.write_target is not None and a.write_target.sql:
                refs.extend(sql_table_refs(a.write_target.sql))
            # reads hidden inside python bodies (reference AST extraction,
            # python_parser.py; see pydeps) — advisories surface on stderr
            pyres = action_python_refs(a, base_dir)
            refs.extend(pyres.tables)
            warnings.extend(
                f"WARNING {fg.pipeline}/{fg.flowgroup}/{a.name}: {w}"
                for w in pyres.warnings
            )
            for v in refs:
                # python bodies read the folded temp-view spelling
                j = writes.get(v)
                if j is None and "__" in v:
                    j = writes.get(v.replace("__", "."))
                if j is not None and j != i:
                    deps[i].add(j)
    return {"deps": {str(i): sorted(s) for i, s in deps.items()},
            "warnings": warnings}


def cmd_deps(args) -> int:
    """Print the cross-flowgroup execution stages (reference: `lhp deps` +
    job stage synthesis, src/lhp/core/jobs/job_generator.py)."""
    import hashlib

    fgs = _discover(args)
    base_dir = getattr(args, "project_root", ".") or "."

    from lakehouse_plumber_spark.graph_cache import graph_cache_for

    cache = graph_cache_for(base_dir)
    if cache is not None:
        # key on the RESOLVED specs (tokens/presets/templates already folded
        # in) plus every python module a dep edge could come from
        h = hashlib.sha256()
        for fg in fgs:
            h.update(json.dumps(fg.model_dump(), sort_keys=True, default=str).encode())
        def _mods():
            # every python body a dep edge could come from: action-level
            # module_path AND load-source module_path (pydeps reads both)
            for fg in fgs:
                for a in fg.actions:
                    mp = a.module_path or (
                        a.source.get("module_path") if isinstance(a.source, dict) else None
                    )
                    if mp:
                        yield mp if os.path.isabs(mp) else os.path.join(base_dir, mp)

        module_paths = list(_mods())
        from lakehouse_plumber_spark.graph_cache import project_graph_key

        h.update(project_graph_key(module_paths).encode())
        built = cache.get_or_build(
            h.hexdigest(), lambda: _build_dep_edges(fgs, base_dir)
        )
    else:
        built = _build_dep_edges(fgs, base_dir)
    deps = {int(i): set(v) for i, v in built["deps"].items()}
    for w in built["warnings"]:
        print(w, file=sys.stderr)
    def _label(i: int) -> str:
        return f"{fgs[i].pipeline}/{fgs[i].flowgroup}"

    # stage assignment (shared by all formats)
    done: set[int] = set()
    stages: list[list[int]] = []
    while len(done) < len(fgs):
        stage = [i for i in range(len(fgs)) if i not in done and deps[i] <= done]
        if not stage:
            print("ERROR: dependency cycle among: "
                  + ", ".join(_label(i) for i in range(len(fgs)) if i not in done))
            return 1
        stages.append(stage)
        done.update(stage)

    fmt = getattr(args, "format", "text") or "text"
    if fmt == "dot":
        # reference export_to_dot (core/dependencies/output.py:29-60)
        def esc(s: str) -> str:
            return s.replace("\\", "\\\\").replace('"', '\\"')

        print("digraph flowgroup_dependencies {")
        print("  rankdir=LR;")
        print("  node [shape=box];")
        for i in range(len(fgs)):
            print(f'  "{esc(_label(i))}";')
        for i in range(len(fgs)):
            for j in sorted(deps[i]):
                print(f'  "{esc(_label(j))}" -> "{esc(_label(i))}";')
        print("}")
        return 0
    if fmt == "json":
        # reference export_to_json (core/dependencies/output.py:63-120)
        out = {
            "flowgroups": [
                {
                    "pipeline": fgs[i].pipeline,
                    "flowgroup": fgs[i].flowgroup,
                    "depends_on": sorted(_label(j) for j in deps[i]),
                    "stage": next(n for n, s in enumerate(stages, 1) if i in s),
                }
                for i in range(len(fgs))
            ],
            "stages": [[_label(i) for i in s] for s in stages],
        }
        print(json.dumps(out, indent=2, sort_keys=True))
        return 0
    for stage_no, stage in enumerate(stages, 1):
        for i in stage:
            up = ", ".join(_label(j) for j in sorted(deps[i])) or "-"
            print(f"stage {stage_no}: {_label(i)}  (after: {up})")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m lakehouse_plumber_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("validate", cmd_validate), ("run", cmd_run),
                     ("compile", cmd_compile), ("deps", cmd_deps)):
        sp = sub.add_parser(name)
        sp.add_argument("project_root")
        sp.add_argument("--env", default=None, help="substitutions/{env}.yaml tokens")
        sp.add_argument("--sandbox", default=None, metavar="NAMESPACE",
                        help="per-developer rename pass: produced tables (and "
                             "reads of them) get the {namespace}_{table} leaf")
        if name == "compile":
            sp.add_argument("-o", "--out", default="generated")
        if name == "deps":
            sp.add_argument("--format", choices=("text", "dot", "json"), default="text",
                            help="output format (reference output.py serializers)")
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
