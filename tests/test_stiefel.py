"""Unit tests: Stiefel projection + BB projected-gradient optimizer."""

import jax.numpy as jnp
import numpy as np

from esoo_tpu.orbital_optimization import (PartialUnitaryProjectionOptimizer,
                                           orth)


def test_orth_produces_orthonormal_columns():
    rng = np.random.default_rng(0)
    V = rng.normal(size=(8, 3))
    U = np.asarray(orth(jnp.asarray(V)))
    np.testing.assert_allclose(U.T @ U, np.eye(3), atol=1e-10)


def test_orth_idempotent_on_orthonormal():
    rng = np.random.default_rng(1)
    Q, _ = np.linalg.qr(rng.normal(size=(6, 4)))
    np.testing.assert_allclose(np.asarray(orth(jnp.asarray(Q))), Q,
                               atol=1e-10)


def test_orth_is_polar_factor():
    """orth(V) equals the orthogonal factor of the polar decomposition."""
    rng = np.random.default_rng(2)
    V = rng.normal(size=(5, 3))
    from scipy.linalg import polar
    Up, _ = polar(V)
    np.testing.assert_allclose(np.asarray(orth(jnp.asarray(V))), Up,
                               atol=1e-9)


def _brockett(U, A, B):
    """tr(U^T A U B): minimized by eigenvectors of A paired to B's order."""
    return jnp.trace(U.T @ A @ U @ B)


def test_bb_descent_brockett_minimum():
    """Known global minimum: sum of the n smallest eigenvalues of A times
    the (descending) diagonal of B (Brockett cost on the Stiefel manifold)."""
    rng = np.random.default_rng(3)
    m, n = 10, 3
    A = rng.normal(size=(m, m))
    A = (A + A.T) / 2
    B = np.diag([3.0, 2.0, 1.0])
    w = np.linalg.eigvalsh(A)
    expected = w[0] * 3.0 + w[1] * 2.0 + w[2] * 1.0

    opt = PartialUnitaryProjectionOptimizer(
        initial_BBstepsize=1e-2, stopping_tolerance=1e-12, maxiter=20000)
    U0 = np.eye(m)[:, :n]
    A_j, B_j = jnp.asarray(A), jnp.asarray(B)
    U, E = opt.compute_optimal_rotation(_brockett, U0, A_j, B_j)
    np.testing.assert_allclose(E, expected, atol=1e-6)
    np.testing.assert_allclose(U.T @ U, np.eye(n), atol=1e-9)


def test_callback_replay_and_result_fields():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(6, 6))
    A = (A + A.T) / 2
    B = np.diag([1.0, 0.5])
    seen = []
    opt = PartialUnitaryProjectionOptimizer(
        initial_BBstepsize=1e-2, stopping_tolerance=1e-8, maxiter=5000,
        callback=lambda it, e: seen.append((it, e)))
    U, E = opt.compute_optimal_rotation(
        _brockett, np.eye(6)[:, :2], jnp.asarray(A), jnp.asarray(B))
    assert len(seen) == opt.last_result.iterations + 1
    assert seen[0][0] == 0
    np.testing.assert_allclose(seen[-1][1], E, atol=1e-9)
    assert opt.last_result.converged


def test_finite_difference_matches_autograd():
    rng = np.random.default_rng(5)
    A = rng.normal(size=(6, 6))
    A = (A + A.T) / 2
    B = np.diag([2.0, 1.0])
    U0 = np.eye(6)[:, :2]
    kwargs = dict(initial_BBstepsize=1e-2, stopping_tolerance=1e-10,
                  maxiter=5000)
    auto = PartialUnitaryProjectionOptimizer(**kwargs)
    fd = PartialUnitaryProjectionOptimizer(
        gradient_method="finite_difference", **kwargs)
    _, E_auto = auto.compute_optimal_rotation(
        _brockett, U0, jnp.asarray(A), jnp.asarray(B))
    _, E_fd = fd.compute_optimal_rotation(
        _brockett, U0, jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_allclose(E_auto, E_fd, atol=1e-6)
