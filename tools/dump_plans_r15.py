#!/usr/bin/env python
"""Dump `.explain("formatted")` for bench queries into plans/r15/.

Usage: python tools/dump_plans_r15.py <suffix> [query ...]

Writes plans/r15/<query>_<suffix>.txt for each bench query (or the
explicit list given). For queries whose registry function returns a
localized `createDataFrame(collect())` result (txn_*/streaming_* legs
that must tear down their workdir), the formatted plan of the INNER
query is captured where the operator exposes it; otherwise the
returned DataFrame's own formatted plan is dumped. Each file also
appends the AQE-final executed plan string so Exchange counts and
join strategies are checkable post-execution.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__.strip().splitlines()[2], file=sys.stderr)
        return 2
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    from ceneton_database_tools_spark import operators as ops
    from ceneton_database_tools_spark.session import get_spark

    spark = get_spark(app_name=f"plans-r15-{suffix}")
    for name, spec in sorted(ops.QUERIES.items()):
        if only and name not in only:
            continue
        if not only and not spec.bench:
            continue
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = spec.fn(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        formatted = buf.getvalue()
        df.collect()  # finalize AQE
        executed = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({suffix}) explain(formatted) ==\n")
            f.write(formatted)
            f.write("\n== AQE-final executed plan ==\n")
            f.write(executed)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
