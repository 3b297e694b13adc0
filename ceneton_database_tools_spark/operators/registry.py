"""Registry of declared queries and their DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2) is declared here as a
named query: a callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are SQL-expressible, the equivalent ANSI SQL that DuckDB runs
over the same parquet tables. The driver's correctness gate compares
the two (row count + schema + order-insensitive value hash), so:

* every computed column is aliased identically on both sides;
* floating-point aggregates are rounded on both sides (summation order
  across partitions is otherwise allowed to differ in the last ulp);
* result sets avoid raw unrounded doubles and unpinned orderings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver's correctness gate always runs at sf0.01; oracles that must
# reference the filesystem directly (read_blob globs — DuckDB functions
# that take paths, not registered views) embed this token instead of a
# hardcoded path so the LOCAL harness can re-render them for any sf_dir
# while the driver-facing oracle_sql() contract stays a plain string.
SF_DIR_TOKEN = "{SF_DIR}"
DRIVER_SF_DIR = "/root/testdata/sf0.01"


def render_oracle(sql: str, sf_dir: str) -> str:
    """Substitute the sf-dir token (plain replace — oracle SQL may
    legally contain other braces, e.g. struct literals)."""
    return sql.replace(SF_DIR_TOKEN, sf_dir.rstrip("/"))


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags, bench=bench
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_catalog(sf_dir: str = DRIVER_SF_DIR) -> dict[str, str]:
    """Driver-facing catalog: oracles rendered for the gate's sf0.01
    (or any sf_dir the local harness passes)."""
    return {
        name: render_oracle(spec.oracle, sf_dir)
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }
