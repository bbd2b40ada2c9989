"""Blueprint expansion semantics (reference: blueprint_expander.py).

Covers: cartesian expansion, parameter defaults/required/unknown, spec-variable
precedence over instance parameters, eager identity-only resolution, env-token
rejection in identity fields, duplicate-tuple detection, discovery integration
(blueprint + instance files expand into runnable flowgroups).
"""

import os
import textwrap

import pytest

from lakehouse_plumber_spark.blueprints import (
    Blueprint,
    BlueprintError,
    BlueprintInstance,
    expand_blueprint,
    expand_blueprints,
    looks_like_blueprint,
    looks_like_instance,
)
from lakehouse_plumber_spark.parsers import discover_flowgroups, load_flowgroup


def make_bp(**over):
    spec = {
        "name": "ingest_site",
        "parameters": [
            {"name": "site", "required": True},
            {"name": "fmt", "default": "parquet"},
        ],
        "flowgroups": [
            {
                "pipeline": "bronze_%{site}",
                "flowgroup": "%{site}_ingest",
                "variables": {"raw_view": "raw_%{site}"},
                "actions": [
                    {
                        "name": "load_raw",
                        "type": "load",
                        "source": {"type": "sql", "sql": "SELECT 1 AS x"},
                        "target": "%{raw_view}",
                    },
                    {
                        "name": "write_out",
                        "type": "write",
                        "source": "%{raw_view}",
                        "write_target": {
                            "type": "materialized_view",
                            "database": "bronze",
                            "table": "%{site}_t",
                        },
                    },
                ],
            }
        ],
    }
    spec.update(over)
    return Blueprint.model_validate(spec)


def test_shape_predicates():
    assert looks_like_blueprint({"flowgroups": [], "parameters": []})
    assert not looks_like_blueprint({"actions": [], "flowgroups": []})
    assert looks_like_instance({"use_blueprint": "x"})
    assert looks_like_instance({"blueprint": "x", "site": "a"})
    assert not looks_like_instance({"pipeline": "p", "flowgroup": "f"})


def test_expansion_cartesian_and_identity_resolution():
    bp = make_bp()
    insts = [
        BlueprintInstance(use_blueprint="ingest_site", parameters={"site": "nyc"}),
        BlueprintInstance(use_blueprint="ingest_site", parameters={"site": "sfo"}),
    ]
    specs = expand_blueprint(bp, insts)
    assert [(s["pipeline"], s["flowgroup"]) for s in specs] == [
        ("bronze_nyc", "nyc_ingest"),
        ("bronze_sfo", "sfo_ingest"),
    ]
    # non-identity %{var}s stay intact for the normal resolution pass
    assert specs[0]["actions"][0]["target"] == "%{raw_view}"
    # defaults flow into merged variables
    assert specs[0]["variables"]["fmt"] == "parquet"


def test_spec_variables_win_over_instance_parameters():
    bp = make_bp()
    # instance maliciously/accidentally sets raw_view; spec-level variables win
    bp2 = Blueprint.model_validate(
        {
            **bp.model_dump(),
            "parameters": bp.model_dump()["parameters"]
            + [{"name": "raw_view", "default": "clobbered"}],
        }
    )
    specs = expand_blueprint(
        bp2,
        [
            BlueprintInstance(
                use_blueprint="ingest_site",
                parameters={"site": "nyc", "raw_view": "clobbered"},
            )
        ],
    )
    assert specs[0]["variables"]["raw_view"] == "raw_%{site}"


def test_required_missing_and_unknown_params():
    bp = make_bp()
    with pytest.raises(BlueprintError, match="missing required"):
        expand_blueprint(bp, [BlueprintInstance(use_blueprint="ingest_site")])
    with pytest.raises(BlueprintError, match="undeclared"):
        expand_blueprint(
            bp,
            [
                BlueprintInstance(
                    use_blueprint="ingest_site",
                    parameters={"site": "a", "nope": 1},
                )
            ],
        )


def test_env_tokens_rejected_in_identity():
    bp = make_bp()
    bp.flowgroups[0]["pipeline"] = "bronze_${env}"
    with pytest.raises(BlueprintError, match="not allowed"):
        expand_blueprint(
            bp,
            [BlueprintInstance(use_blueprint="ingest_site", parameters={"site": "a"})],
        )


def test_duplicate_tuple_detection_across_instances():
    bp = make_bp()
    insts = [
        BlueprintInstance(
            use_blueprint="ingest_site", parameters={"site": "nyc"}, source="a.yaml"
        ),
        BlueprintInstance(
            use_blueprint="ingest_site", parameters={"site": "nyc"}, source="b.yaml"
        ),
    ]
    with pytest.raises(BlueprintError, match="duplicate"):
        expand_blueprints({"ingest_site": bp}, insts)


def test_legacy_instance_shape_normalizes():
    inst = BlueprintInstance.model_validate({"blueprint": "ingest_site", "site": "nyc"})
    assert inst.use_blueprint == "ingest_site"
    assert inst.parameters == {"site": "nyc"}
    with pytest.raises(Exception, match="mix"):
        BlueprintInstance.model_validate(
            {"blueprint": "x", "use_blueprint": "x", "parameters": {}}
        )


def test_expanded_spec_loads_as_flowgroup():
    bp = make_bp()
    specs = expand_blueprint(
        bp, [BlueprintInstance(use_blueprint="ingest_site", parameters={"site": "nyc"})]
    )
    fg = load_flowgroup(specs[0])
    assert fg.pipeline == "bronze_nyc"
    assert fg.actions[0].target == "raw_nyc"
    assert fg.actions[1].source == "raw_nyc"
    assert fg.actions[1].write_target.table == "nyc_t"


def test_discovery_expands_blueprint_files(tmp_path):
    root = tmp_path / "proj"
    (root / "pipelines").mkdir(parents=True)
    (root / "blueprints").mkdir()
    (root / "blueprints" / "ingest_site.yaml").write_text(
        textwrap.dedent(
            """
            name: ingest_site
            parameters:
              - name: site
                required: true
            flowgroups:
              - pipeline: bronze_%{site}
                flowgroup: "%{site}_ingest"
                actions:
                  - name: load_raw
                    type: load
                    source: {type: sql, sql: "SELECT 1 AS x"}
                    target: raw_%{site}
                  - name: write_out
                    type: write
                    source: raw_%{site}
                    write_target: {type: materialized_view, database: bronze, table: "%{site}_t"}
            """
        )
    )
    for site in ("nyc", "sfo"):
        (root / "pipelines" / f"{site}.yaml").write_text(
            f"use_blueprint: ingest_site\nparameters:\n  site: {site}\n"
        )
    (root / "pipelines" / "plain.yaml").write_text(
        textwrap.dedent(
            """
            pipeline: gold
            flowgroup: plain
            actions:
              - name: load_one
                type: load
                source: {type: sql, sql: "SELECT 2 AS y"}
                target: v_one
              - name: write_one
                type: write
                source: v_one
                write_target: {type: materialized_view, database: gold, table: plain_t}
            """
        )
    )
    fgs = discover_flowgroups(str(root))
    names = sorted((fg.pipeline, fg.flowgroup) for fg in fgs)
    assert names == [
        ("bronze_nyc", "nyc_ingest"),
        ("bronze_sfo", "sfo_ingest"),
        ("gold", "plain"),
    ]
