import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontology_matcher_spark import fixtures as fx  # noqa: E402
from ontology_matcher_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("omx-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def bundle():
    return fx.generate(seed=42, clusters_per_type=60, mentions_per_type=40, n_docs=200)


@pytest.fixture(scope="session")
def fixture_dir(bundle, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fixtures"))
    fx.write_parquet(bundle, d)
    return d
