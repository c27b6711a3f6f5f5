from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lucene_solr_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # local[8]: the suite is ~250 small build+query jobs; 8 threads cuts
    # wall time vs local[4] without entering the single-JVM anti-scaling
    # region BENCH.md §1 documents past ~12. Engine results are
    # parallelism-invariant by contract (test_invariance.py pins it).
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
