import pytest

from qurio_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="qurio-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},  # stable tiny-test plans
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _fresh_worker_provider_cache():
    """providers.worker_shared caches one provider per config key per
    PROCESS — exactly right in an executor worker, but in the test
    process two tests using config-identical providers would share
    breaker state across tests.  Clear it per test."""
    from qurio_spark.functions.providers import _WORKER_PROVIDER_CACHE

    _WORKER_PROVIDER_CACHE.clear()
    yield
