from __future__ import annotations

import os
import sys

import pytest
from hypothesis import settings as _hyp_settings

# Deterministic, reproducible property tests: derandomize seeds each test
# from its own name (same examples every run, no example-database state),
# and print_blob emits a @reproduce_failure decorator on any failure so a
# counterexample found in CI reproduces locally from the log alone.
_hyp_settings.register_profile("repro", derandomize=True, print_blob=True)
_hyp_settings.load_profile("repro")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from kinesis_log_streamer_spark.session import get_spark

    spark = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
