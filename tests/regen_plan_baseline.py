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
STREAM_OUT = os.path.join(os.path.dirname(__file__), "data", "stream_stateful_counts.json")
SF_PLAN = "/root/testdata/sf0.001"

# Stateful streaming physical operators — one Save per stateful agg
# (its Restore twin is implied), plus the dedup / symmetric-join /
# custom-state nodes. SessionWindowStateStoreSave listed before the
# \b guard would matter: 'StateStoreSave' inside it is preceded by a
# word char, so \b already keeps the two distinct.
STATEFUL_OP_RE = (
    r"\b(SessionWindowStateStoreSave|StateStoreSave|StreamingDeduplicate\w*"
    r"|StreamingSymmetricHashJoin|FlatMapGroupsInPandasWithState"
    r"|TransformWithState\w*)\b"
)


def exchange_count(plan: str) -> int:
    """Shuffle exchanges in an executed-plan string. \\bExchange does
    not match inside ReusedExchange (preceded by a word char), so a
    reused shuffle — already paid for — is not double-counted;
    BroadcastExchange is excluded the same way (broadcasts move a
    bounded build side, not the data)."""
    import re

    return len(re.findall(r"(?<![A-Za-z])Exchange ", plan))


def stateful_count(plan: str) -> int:
    """Stateful streaming operators in an executed micro-batch plan."""
    import re

    return len(re.findall(STATEFUL_OP_RE, plan))


def build_counts() -> tuple[dict[str, int], dict[str, int]]:
    from ceneton_database_tools_spark import operators as ops
    from ceneton_database_tools_spark.session import get_spark
    from ceneton_database_tools_spark.streaming import events as stream_events

    from tests.test_plan_lint import SELF_CHECKING_PLANS

    spark = get_spark(app_name="plan-baseline", cpus=32)
    counts: dict[str, int] = {}
    stateful: dict[str, int] = {}
    for name, spec in sorted(ops.QUERIES.items()):
        if "streaming" in spec.tags or name.startswith("streaming"):
            # Streaming plans only exist after execution: run the query
            # to completion (cheap at sf0.001) and read the harness's
            # snapshot of the last micro-batch's executed plan.
            spec.fn(spark, SF_PLAN)
            plan = stream_events.LAST_STREAM_PLAN["plan"]
            counts[name] = exchange_count(plan)
            stateful[name] = stateful_count(plan)
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
    return counts, stateful


if __name__ == "__main__":
    counts, stateful = build_counts()
    with open(OUT, "w") as f:
        json.dump(counts, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(STREAM_OUT, "w") as f:
        json.dump(stateful, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(counts)} baselines to {OUT}")
    print(f"wrote {len(stateful)} stateful-op baselines to {STREAM_OUT}")
