import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Small deterministic images+ref_tiles fixture on disk (FIXTURES.md F1/F2)."""
    from gtfs_conflation_pipeline_ray.sources.fixtures import write_fixture

    d = tmp_path_factory.mktemp("imgfix")
    write_fixture(str(d), n_images=300, n_tiles=40, rows_per_file=100)
    return str(d)
