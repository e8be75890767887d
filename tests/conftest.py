"""Session-scoped Ray + fixture graphs for the test suite."""

from __future__ import annotations

import logging

import numpy as np
import pytest
import ray

from parallel_pagerank_ray.sources import pages as pages_src

REFERENCE_GRAPHS = {
    # edge lists from the reference fixtures (FIXTURES.md §3)
    "small": (4, [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 1), (3, 2)]),
    "medium": (
        10,
        [(0, 1), (0, 3), (0, 5), (1, 2), (1, 4), (2, 3), (2, 6), (3, 1), (3, 4),
         (3, 7), (4, 5), (4, 8), (5, 0), (5, 6), (6, 2), (6, 7), (6, 9), (7, 3),
         (7, 8), (8, 4), (8, 9), (9, 0), (9, 5), (9, 7), (9, 8)],
    ),
    # small + node 4 with only in-edges (dangling-mass path, FIXTURES.md §3.4)
    "dangling4": (5, [(0, 1), (0, 2), (1, 2), (2, 0), (2, 4), (3, 0), (3, 1), (3, 2)]),
    # two disjoint 6-rings (components/labels exactness)
    "two_comps": (
        12,
        [(i, (i + 1) % 6) for i in range(6)]
        + [(6 + i, 6 + (i + 1) % 6) for i in range(6)],
    ),
}


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level=logging.ERROR,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def graphs() -> dict[str, tuple[int, np.ndarray]]:
    return {
        name: (n, np.array(e, dtype=np.int64))
        for name, (n, e) in REFERENCE_GRAPHS.items()
    }


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory, graphs):
    """Parquet pages tables (FIXTURES.md §1) for each fixture graph."""
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("pages")
    for name, (n, edges) in graphs.items():
        pq.write_table(pages_src.pages_table(name, n, edges), root / f"{name}.parquet")
    return root
