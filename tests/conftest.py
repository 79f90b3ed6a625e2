import pytest


@pytest.fixture(scope="session")
def spark():
    from ollie_spark.spark.session import build_session
    s = build_session("ollie-spark-tests", master="local[4]",
                      shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "4g"})
    yield s
    s.stop()
