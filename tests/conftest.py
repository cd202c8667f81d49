import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session(tmp_path_factory):
    """ONE Ray session for the whole pytest run (driver requirement)."""
    # graph-build caches must not leak across pytest sessions
    os.environ["DRONE_RAY_CACHE"] = str(tmp_path_factory.mktemp("graph_cache"))
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
    yield
    ray.shutdown()
