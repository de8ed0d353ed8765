from __future__ import annotations

import json
import os
import sys

import pytest

# repo root on sys.path so `jsonld_spark` and `__spark_entry__` import
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_FIXTURES = "/root/reference/Test/Fixtures"


def load_reference_fixture(name: str):
    """Replay a fixture from the read-only reference checkout as a
    golden (the reference's own API tests use these same files)."""
    path = os.path.join(REFERENCE_FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not available")
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession for tier-2 tests."""
    from jsonld_spark.plans.session import get_spark

    spark = get_spark(app_name="jsonld-spark-tests", cores=4, shuffle_partitions=8)
    yield spark
