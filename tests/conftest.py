from __future__ import annotations

import os

import pytest

from ceneton_database_tools_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
# The driver's gate runs at sf0.01; override to re-run the full local
# oracle-parity suite at another scale, e.g.
#   SPARK_GRAFT_SF_CORRECT=/root/testdata/sf0.1 pytest tests/test_oracle_parity.py
SF_CORRECT = os.environ.get("SPARK_GRAFT_SF_CORRECT", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # Mirror the driver's local[32]: round-1's sessionization tie-break
    # bug passed at local[8] and failed at local[32] — parallelism must
    # match the gate or parallelism-dependent nondeterminism hides.
    spark = get_spark(app_name="tests", cpus=32)
    yield spark
    from ceneton_database_tools_spark.operators.dedup import release_persisted

    release_persisted()
    spark.stop()


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return SF_CORRECT
