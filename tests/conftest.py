import os

import numpy as np
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
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def tiles_small(ray_session, tmp_path_factory):
    """1k-tile deterministic fixture parquet (FIXTURES.md tier t1)."""
    from biomass_processing_pipeline_ray.sources.tiles import generate_tiles_parquet

    out = str(tmp_path_factory.mktemp("fixtures") / "tiles_t1")
    generate_tiles_parquet(1000, out, seed=42)
    return out


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)
