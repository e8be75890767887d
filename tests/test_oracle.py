"""Oracle vs the golden values committed in FIXTURES.md / BASELINE.md."""

import numpy as np

from parallel_pagerank_ray import oracle

GOLDEN_SMALL = [0.37324769, 0.20675544, 0.38249687, 0.03750000]
GOLDEN_MEDIUM = [0.08492336, 0.07000253, 0.07155011, 0.10920213, 0.13152767,
                 0.11570850, 0.09458452, 0.09348749, 0.13137859, 0.09763510]


def test_pagerank_golden_small(graphs):
    n, e = graphs["small"]
    t = oracle.pagerank(n, e, tol=1e-6)
    assert t.iterations == 24 and t.exit_reason == "max_err"
    assert np.allclose(t.ranks, GOLDEN_SMALL, atol=1e-8)
    t4 = oracle.pagerank(n, e, tol=1e-4)
    assert t4.iterations == 16 and t4.exit_reason == "l1"


def test_pagerank_golden_medium(graphs):
    n, e = graphs["medium"]
    t = oracle.pagerank(n, e, tol=1e-6)
    assert t.iterations == 17 and t.exit_reason == "max_err"
    assert np.allclose(t.ranks, GOLDEN_MEDIUM, atol=1e-8)
    # dual-criterion regression: exits via max_err while L1 still > tol
    t4 = oracle.pagerank(n, e, tol=1e-4)
    assert t4.iterations == 10 and t4.exit_reason == "max_err"
    assert t4.history[-1][1] > 1e-4  # l1 at exit


def test_dangling_mass_conserved(graphs):
    n, e = graphs["dangling4"]
    t = oracle.pagerank(n, e, tol=1e-6)
    assert abs(t.ranks.sum() - 1.0) < 1e-9  # redistribution keeps total mass


def test_components_two_rings(graphs):
    n, e = graphs["two_comps"]
    comp = oracle.connected_components(n, e)
    assert list(comp) == [0] * 6 + [6] * 6


def test_triangles_small(graphs):
    n, e = graphs["small"]
    assert oracle.triangle_count(n, e) == 4  # FIXTURES.md §3.1
