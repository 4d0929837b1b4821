import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_t0(tmp_path_factory):
    """Small deterministic crawl fixture (~600 pages, 8 hosts)."""
    from crawler_ray.fixtures import write_fixture
    d = tmp_path_factory.mktemp("fix") / "t0"
    return write_fixture(str(d), "t1", n_pages=600, n_hosts=8)


@pytest.fixture(scope="session")
def oracle_t0(fixture_t0):
    import pyarrow.parquet as pq

    from crawler_ray.oracle import crawl_oracle
    return crawl_oracle(pq.read_table(f"{fixture_t0}/pages.parquet"),
                        pq.read_table(f"{fixture_t0}/seeds.parquet"),
                        pq.read_table(f"{fixture_t0}/robots.parquet"))
