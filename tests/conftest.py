"""Session-scoped Ray fixture: exactly one ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


FIXTURE_JPG = "/root/reference/test/fixtures/SekienAkashita.jpg"


@pytest.fixture(scope="session")
def sekien() -> bytes:
    with open(FIXTURE_JPG, "rb") as f:
        return f.read()
