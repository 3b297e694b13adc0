"""Regenerate tests/data/plan_exchange_counts.json — the committed
per-query Exchange-count baseline that test_plan_lint.py checks.

Run AFTER an intentional plan change:

    python tests/regen_plan_baseline.py

then review the diff: every changed count must be explainable by the
change you just made (a new aggregation step, a removed shuffle). A
count that moved on its own is plan drift — the thing the guard exists
to catch.
"""

from __future__ import annotations

import json
import os
import sys

__test__ = False

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(__file__), "data", "plan_exchange_counts.json")
SF_PLAN = "/root/testdata/sf0.001"


def exchange_count(plan: str) -> int:
    """Shuffle exchanges in an executed-plan string. \\bExchange does
    not match inside ReusedExchange (preceded by a word char), so a
    reused shuffle — already paid for — is not double-counted;
    BroadcastExchange is excluded the same way (broadcasts move a
    bounded build side, not the data)."""
    import re

    return len(re.findall(r"(?<![A-Za-z])Exchange ", plan))


def build_counts() -> dict[str, int]:
    from ceneton_database_tools_spark import operators as ops
    from ceneton_database_tools_spark.session import get_spark

    from tests.test_plan_lint import SELF_CHECKING_PLANS

    spark = get_spark(app_name="plan-baseline", cpus=32)
    counts: dict[str, int] = {}
    for name, spec in sorted(ops.QUERIES.items()):
        if "streaming" in spec.tags or name.startswith("streaming"):
            continue
        if name in SELF_CHECKING_PLANS:
            continue
        plan = spec.fn(spark, SF_PLAN)._jdf.queryExecution().executedPlan().toString()
        counts[name] = exchange_count(plan)
    # The plan-self-checking operators execute real jobs and return
    # LocalRelation snapshots, so their INNER plan is recorded by the
    # operator itself at execution time — run each in its sandbox
    # (table/conf side effects are cleaned up by the operator) and pin
    # the recorded count.
    from ceneton_database_tools_spark.operators import scale as scale_ops

    for name in sorted(SELF_CHECKING_PLANS):
        ops.QUERIES[name].fn(spark, SF_PLAN)
        counts[name] = scale_ops.INNER_PLAN_EXCHANGES[name]
    spark.stop()
    return counts


if __name__ == "__main__":
    counts = build_counts()
    with open(OUT, "w") as f:
        json.dump(counts, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(counts)} baselines to {OUT}")
