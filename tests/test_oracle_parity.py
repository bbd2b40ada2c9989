"""The correctness gate, locally: every queries() entry must hash-match its
DuckDB oracle (exact equality after canonical sort). Run at sf0.001 by
default; set LHP_TEST_SF_DIR=/root/testdata/sf0.01 for the driver's scale.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_harness import duck_connection, run_one


def _registry():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    return [(name, fn, o.get(name)) for name, fn in q.items()]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name,fn,sql", _registry(), ids=[n for n, _, _ in _registry()])
def test_query_matches_oracle(spark, testdata, duck, name, fn, sql):
    problems = run_one(spark, duck, name, fn, sql, SF_DIR)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
