import shutil
from pathlib import Path

import pytest

TEST_SF = "sf0.0002"  # ~400 turns — fast builds
OUT = Path("/tmp/graft_test_index")


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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_small():
    """Tiny synthesized transcripts fixture dir (~2k turns)."""
    from ir_search_engine_ray.datagen import fixture_dir

    return str(fixture_dir("sf0.001"))


@pytest.fixture(scope="session")
def corpus(ray_session):
    from ir_search_engine_ray.datagen import fixture_dir

    return fixture_dir(TEST_SF)


@pytest.fixture(scope="session")
def built(ray_session, corpus):
    from ir_search_engine_ray.pipelines.index_build import build_index

    shutil.rmtree(OUT, ignore_errors=True)
    return build_index(str(corpus / "transcripts"), OUT, concurrency=2)
