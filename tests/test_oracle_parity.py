"""Every registered query with an oracle must match DuckDB at sf0.01.

This is the local replica of the driver's t2 gate: one parametrized
test per registry entry. Queries without oracle SQL get a rows-only
smoke check (same as the driver's weaker check).
"""

from __future__ import annotations

import pytest

from ceneton_database_tools_spark import operators as ops
from tests.oracle_harness import compare, compare_driver_canon, duck_con

_NAMES = sorted(ops.QUERIES)


@pytest.fixture(scope="module")
def con(sf_correct):
    con = duck_con(sf_correct)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, sf_correct, con, name):
    spec = ops.QUERIES[name]
    df = spec.fn(spark, sf_correct)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        return
    oracle = ops.render_oracle(spec.oracle, sf_correct)
    problems = compare(df, con, oracle)
    problems += compare_driver_canon(df, con, oracle)
    assert not problems, f"{name}:\n" + "\n".join(problems)
