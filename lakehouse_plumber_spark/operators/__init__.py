"""Operator executors, dispatched by (action_type, sub_type).

Mirror of the reference generator registry
(src/lhp/generators/registration.py:43-87): 7 load x 5 transform x 3 write
(+4 sink sub-types, +3 streaming-table modes) x 9 test — but each entry here
*executes* Spark DataFrame ops instead of emitting source text.
"""

from lakehouse_plumber_spark.operators import load as _load
from lakehouse_plumber_spark.operators import transform as _transform
from lakehouse_plumber_spark.operators import write as _write
from lakehouse_plumber_spark.operators import tests as _tests

REGISTRY = {
    ("load", "cloudfiles"): _load.load_cloudfiles,
    ("load", "delta"): _load.load_delta,
    ("load", "sql"): _load.load_sql,
    ("load", "python"): _load.load_python,
    ("load", "jdbc"): _load.load_jdbc,
    ("load", "kafka"): _load.load_kafka,
    ("load", "custom_datasource"): _load.load_custom_datasource,
    ("transform", "sql"): _transform.transform_sql,
    ("transform", "python"): _transform.transform_python,
    ("transform", "schema"): _transform.transform_schema,
    ("transform", "temp_table"): _transform.transform_temp_table,
    ("transform", "data_quality"): _transform.transform_data_quality,
    # engine extensions: BM25 retrieval / corpus dedup as declarative actions
    ("transform", "retrieval"): _transform.transform_retrieval,
    ("transform", "dedup"): _transform.transform_dedup,
    ("transform", "sample"): _transform.transform_sample,
    ("transform", "knn"): _transform.transform_knn,
    ("transform", "multimodal"): _transform.transform_multimodal,
    ("transform", "text"): _transform.transform_text,
    ("write", "streaming_table"): _write.write_streaming_table,
    ("write", "materialized_view"): _write.write_materialized_view,
    ("write", "sink"): _write.write_sink,
    ("test", "row_count"): _tests.test_row_count,
    ("test", "uniqueness"): _tests.test_uniqueness,
    ("test", "referential_integrity"): _tests.test_referential_integrity,
    ("test", "completeness"): _tests.test_completeness,
    ("test", "range"): _tests.test_range,
    ("test", "schema_match"): _tests.test_schema_match,
    ("test", "all_lookups_found"): _tests.test_all_lookups_found,
    ("test", "custom_sql"): _tests.test_custom_sql,
    ("test", "custom_expectations"): _tests.test_custom_expectations,
}
