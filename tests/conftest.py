import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("ADAM_SPARK_SHUFFLE_PARTITIONS", "8")


@pytest.fixture(scope="session")
def spark():
    from adam_spark.session import get_spark

    s = get_spark("adam-spark-tests")
    yield s


@pytest.fixture(scope="session")
def fixtures(spark):
    """Deterministic synthetic genomic tables per FIXTURES.md."""
    from tests.genomic_fixtures import GenomicFixtures

    return GenomicFixtures(spark)
