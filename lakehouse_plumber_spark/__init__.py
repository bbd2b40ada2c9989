"""lakehouse_plumber_spark — a PySpark-native declarative pipeline engine.

A from-scratch engine with the query and data-processing capabilities of the
reference compiler (Mmodarre/Lakehouse_Plumber v0.9.1, studied read-only): the
YAML flowgroup/action model, load/transform/write/test operators, data-quality
expectations with quarantine DLQ, AUTO CDC (SCD1/SCD2), snapshot CDC,
materialized views, streaming tables with multi-flow fan-in — re-expressed as an
*executing* runtime on the open-source PySpark DataFrame / SQL / Structured
Streaming stack instead of generated Databricks-DLT source text.

Architecture (SURVEY.md §7):

    spec layer    : YAML flowgroup/actions  -> pydantic models (models.py)
    logical layer : action graph            -> topo-sorted view DAG (dag.py)
    physical layer: action -> DataFrame builder (operators/*)
    runtime       : PipelineRunner builds {view: DataFrame} in topo order,
                    executes writes, emits an event log (runner.py)

Storage: Delta Lake when delta-spark is on the classpath, otherwise a
parquet-backed managed table store with atomic-swap merge emulation
(tables.py) — same MERGE semantics, swap the format at deploy time.
"""

from lakehouse_plumber_spark.session import get_spark, register_testdata
from lakehouse_plumber_spark.models import (
    Action,
    ActionType,
    CDCConfig,
    FlowGroup,
    SnapshotCDCConfig,
    WriteTarget,
)
from lakehouse_plumber_spark.runner import PipelineRunner
from lakehouse_plumber_spark.parsers import load_flowgroup, load_flowgroup_file

__version__ = "0.1.0"

__all__ = [
    "Action",
    "ActionType",
    "CDCConfig",
    "FlowGroup",
    "PipelineRunner",
    "SnapshotCDCConfig",
    "WriteTarget",
    "get_spark",
    "load_flowgroup",
    "load_flowgroup_file",
    "register_testdata",
]
