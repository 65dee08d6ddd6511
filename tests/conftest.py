import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Shared tiny deterministic corpus + query set (FIXTURES.md F1/F2)."""
    from anomaly_detection_ray.sources.corpus import generate_corpus, generate_queries, write_corpus

    d = tmp_path_factory.mktemp("corpus_tiny")
    paths = write_corpus(str(d), n_docs=200, seed=42, n_files=3)
    return {
        "dir": str(d),
        "paths": paths,
        "table": generate_corpus(200, seed=42),
        "queries": generate_queries(30, seed=43),
    }


SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"
