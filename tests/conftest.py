import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from knowledgegraphsiqidis_spark.session import get_spark
    s = get_spark("kgspark-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ref():
    from tests._reference_oracle import load_reference
    return load_reference()
