import pytest

from geo_epic_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(4, "pytest", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
