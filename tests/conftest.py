import pytest


@pytest.fixture(scope="session")
def spark():
    from eynollah_spark.session import build_session

    s = build_session(app="eynollah_spark_tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
