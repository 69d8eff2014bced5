import os

import pytest

REFERENCE_FIXTURES = "/root/reference/tests/fixtures"
TESTDATA = os.environ.get("GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")


def ref_fixture(relpath: str) -> str:
    return os.path.join(REFERENCE_FIXTURES, relpath)
