"""Regenerate README.md's headline counts from ground truth so they
can never rot again (VERDICT r8 found them hand-typed and stale).

    python tools/update_readme_counts.py

* query count  — ``len(operators.QUERIES)`` (the registry itself)
* gated count  — ``len(operators.oracle_catalog())``
* test count   — ``pytest --collect-only`` over ``tests/``

``tests/test_plan_lint.py`` guards the result: the query count is
asserted against the registry on every run, and the test count against
the live collected session whenever the full suite runs.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
README = os.path.join(REPO, "README.md")


def main() -> None:
    from ceneton_database_tools_spark import operators as ops

    nq = len(ops.QUERIES)
    ng = len(ops.oracle_catalog())
    assert nq == ng, f"registry regrew an oracle-less query: {nq} != {ng}"
    collect = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    m = re.search(r"(\d+) tests collected", collect.stdout)
    assert m, f"could not parse pytest collection:\n{collect.stdout[-500:]}"
    nt = int(m.group(1))

    txt = open(README).read()
    txt, n1 = re.subn(
        r"\*\*\d+ declared queries, ALL \d+ DuckDB-oracle-gated\*\*",
        f"**{nq} declared queries, ALL {ng} DuckDB-oracle-gated**",
        txt,
    )
    txt, n2 = re.subn(
        r"\(\d+ tests, including", f"({nt} tests, including", txt
    )
    assert n1 == 1 and n2 == 1, f"README anchors moved (hits: {n1}, {n2})"
    open(README, "w").write(txt)
    print(f"README.md: {nq} queries ({ng} gated), {nt} tests")


if __name__ == "__main__":
    main()
