import numpy as np
import pytest

from slam_tpu.models.covgraph import CovarianceGraph


def chain_graph(n=6, scale=0.01):
    g = CovarianceGraph(n)
    for i in range(n - 1):
        g.add_edge(i, i + 1, np.eye(6) * scale)
    return g


def test_shortest_path_on_chain():
    g = chain_graph()
    assert g.shortest_path(0, 5) == [0, 1, 2, 3, 4, 5]
    assert g.shortest_path(3, 1) == [3, 2, 1]


def test_loop_edge_shortcuts_path():
    g = chain_graph()
    g.add_edge(0, 5, np.eye(6) * 0.001)  # cheap loop edge
    assert g.shortest_path(0, 5) == [0, 5]
    # path covariance uses the shortcut
    np.testing.assert_allclose(g.path_covariance(0, 5), np.eye(6) * 0.001)


def test_path_covariance_sums_edges():
    g = chain_graph(scale=0.02)
    cov = g.path_covariance(0, 3)
    np.testing.assert_allclose(cov, np.eye(6) * 0.06)


def test_disconnected_returns_empty():
    g = CovarianceGraph(4)
    g.add_edge(0, 1, np.eye(6))
    assert g.shortest_path(0, 3) == []


def test_update_edge_changes_weight():
    g = chain_graph()
    g.add_edge(0, 5, np.eye(6) * 10.0)  # expensive: not taken
    assert g.shortest_path(0, 5)[1] == 1
    g.update_edge(0, 5, np.eye(6) * 1e-6)
    assert g.shortest_path(0, 5) == [0, 5]


def test_path_cov_approximates_exact_relative_cov():
    """Cross-check the reference's approximation against slam_tpu's exact
    posterior relative covariance on a noise-free chain."""
    import jax
    from slam_tpu.models.pose_graph import PoseGraph
    from tests.test_pose_graph import make_chain

    N = 8
    T_gt, _ = make_chain(jax.random.PRNGKey(0), N=N, drift=0.0)
    Z = np.stack([T_gt[i + 1] @ np.linalg.inv(T_gt[i]) for i in range(N - 1)])
    pg = PoseGraph()
    pg.nodes = T_gt.copy()
    pg.keyframes = list(range(N))
    pg.e_i = np.arange(N - 1, dtype=np.int32)
    pg.e_j = np.arange(1, N, dtype=np.int32)
    pg.Z = Z.astype(np.float32)
    pg.sqrt_info = np.tile(np.eye(6, dtype=np.float32) * 10.0, (N - 1, 1, 1))
    pg.is_loop = np.zeros(N - 1, bool)

    g = CovarianceGraph.from_pose_graph(pg)
    approx = g.path_covariance(2, 5)  # 3 edges x I/100
    np.testing.assert_allclose(approx, np.eye(6) * 0.03, atol=1e-6)
    exact = pg.relative_covariance(2, 5)
    # rotation block: approximation matches the exact posterior closely
    # (atol covers ~1%-of-diagonal off-diagonal terms from the exact
    # posterior's f32 Jacobi-preconditioned inverse)
    np.testing.assert_allclose(approx[:3, :3], exact[:3, :3],
                               rtol=0.25, atol=5e-4)
    # translation block: the path-sum approximation ignores rotation
    # lever arms entirely, so it *underestimates* the exact posterior —
    # just check positive-definiteness of both
    assert (np.linalg.eigvalsh(exact) > -1e-6).all()
    assert (np.linalg.eigvalsh(approx) > 0).all()
