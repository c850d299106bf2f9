import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fix600():
    """Cached 600-file corpus fixture directory (FIXTURES.md sf-unit+)."""
    from fora_ray.fixtures import fixture_dir

    return fixture_dir(600)


@pytest.fixture(scope="session")
def graph600(fix600):
    """(edges ndarray (E,2), n) for the 600-file fixture."""
    import numpy as np
    import pyarrow.parquet as pq

    ge = pq.read_table(f"{fix600}/edges.parquet")
    edges = np.stack([ge["src"].to_numpy(), ge["dst"].to_numpy()], axis=1)
    return edges, 600
