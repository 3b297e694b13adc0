"""Physical-plan dump for the headline (bench=True) queries.

``python -m ceneton_database_tools_spark.plans [sf_dir] > PLANS.md``
regenerates PLANS.md: for every bench query, the AQE-final formatted
physical plan as executed at the given scale factor. The dump is the
evidence artifact for the scale-posture claims in the operator
docstrings — pushed filters, pruned ReadSchema, AQE-chosen broadcasts,
map-side partial aggregates, TakeOrderedAndProject top-ks.
"""

from __future__ import annotations

import sys


def dump_plans(sf_dir: str, out=sys.stdout) -> None:
    from ceneton_database_tools_spark import operators as ops
    from ceneton_database_tools_spark.session import get_spark

    spark = get_spark(app_name="plans")
    print("# Physical plans (bench queries, AQE-final)", file=out)
    print(f"\nScale directory: `{sf_dir}` — regenerate with", file=out)
    print("`python -m ceneton_database_tools_spark.plans > PLANS.md`.\n", file=out)
    for name, spec in sorted(ops.QUERIES.items()):
        if not spec.bench:
            continue
        df = spec.fn(spark, sf_dir)
        df.collect()  # materialize so AQE finalizes the plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        first_line = (spec.doc or "").split("\n")[0].strip()
        print(f"## {name}\n\n{first_line}\n", file=out)
        print("```\n" + plan.strip() + "\n```\n", file=out)
    spark.stop()


if __name__ == "__main__":
    import os

    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    dump_plans(sf)
