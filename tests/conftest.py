import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from set_sketch_paper_spark.functions.session import get_spark

    s = get_spark(app_name="tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "4")),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def rng():
    return np.random.RandomState(42)


def random_u64(rng, n):
    """n distinct-ish uniform 64-bit elements (collision prob negligible)."""
    return rng.randint(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
