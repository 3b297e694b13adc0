"""Every registered query with an oracle must match DuckDB at sf0.01.

This is the local replica of the driver's t2 gate: one parametrized
test per registry entry. Queries without oracle SQL get a rows-only
smoke check (same as the driver's weaker check).
"""

from __future__ import annotations

import pytest

from ceneton_database_tools_spark import operators as ops
from tests.oracle_harness import compare_both, duck_con

_NAMES = sorted(ops.QUERIES)


@pytest.fixture(scope="module")
def con(sf_correct):
    con = duck_con(sf_correct)
    yield con
    con.close()


def test_registry_fully_oracle_gated():
    """Every registered query must carry oracle SQL: the driver's gate
    samples ~50 registry entries per round, and an oracle-less entry
    gets only the weaker rows-only check. A genuinely SQL-inexpressible
    operator must find a gateable reformulation (agg_approx_distinct
    gates its HLL error BOUND as a boolean) rather than opt out."""
    missing = sorted(n for n, s in ops.QUERIES.items() if s.oracle is None)
    assert missing == [], f"oracle-less registry entries: {missing}"


def test_every_oracle_renders_clean():
    """No oracle may hardcode a scale directory — filesystem paths go
    through the {SF_DIR} token so the local harness can re-render them
    at any scale (and nothing else brace-like is mangled)."""
    for name, spec in ops.QUERIES.items():
        if spec.oracle is None:
            continue
        assert "/root/testdata/sf" not in spec.oracle, f"{name}: hardcoded sf dir"
        rendered = ops.render_oracle(spec.oracle, "/some/dir/")
        assert "{SF_DIR}" not in rendered


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, sf_correct, con, name):
    spec = ops.QUERIES[name]
    df = spec.fn(spark, sf_correct)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        return
    oracle = ops.render_oracle(spec.oracle, sf_correct)
    problems = compare_both(df, con, oracle)
    assert not problems, f"{name}:\n" + "\n".join(problems)
