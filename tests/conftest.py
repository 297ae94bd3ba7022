import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (module-level init is a
    known anti-pattern: every init/shutdown costs seconds)."""
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
def pages_1k(tmp_path_factory):
    from gxdindexer_ray.fixtures import generate_pages

    d = tmp_path_factory.mktemp("fixtures") / "pages_1k"
    return str(generate_pages(d, 1000, seed=42))


@pytest.fixture(scope="session")
def oracle_1k(pages_1k):
    from gxdindexer_ray.oracle import OracleIndex

    return OracleIndex.build_from_pages(pages_1k)
