import pytest


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
