"""Unit tests: rotation/energy kernels — spatial fast path vs spin-orbital
oracle, staged-GEMM transform vs naive einsum."""

import jax.numpy as jnp
import numpy as np
import pytest

from esoo_tpu.orbital_optimization.kernels import (
    expand_spin, expand_spin_tensors, rotate_one_body, rotate_two_body,
    rotated_energy_so, rotated_energy_spatial, spatial_blocks,
    spin_blocks_consistent, spin_reduce_rdms)
from esoo_tpu.orbital_optimization.stiefel import orth


def test_expand_spin():
    u = np.arange(6.0).reshape(3, 2)
    U = np.asarray(expand_spin(jnp.asarray(u)))
    np.testing.assert_allclose(U[:3, :2], u)
    np.testing.assert_allclose(U[3:, 2:], u)
    np.testing.assert_allclose(U[:3, 2:], 0)
    np.testing.assert_allclose(U[3:, :2], 0)


def test_rotate_two_body_vs_naive_einsum():
    rng = np.random.default_rng(0)
    g = rng.normal(size=(4, 4, 4, 4))
    u = rng.normal(size=(4, 2))
    got = np.asarray(rotate_two_body(jnp.asarray(g), jnp.asarray(u)))
    want = np.einsum("pqrs,pi,qj,rk,sl->ijkl", g, u, u, u, u)
    np.testing.assert_allclose(got, want, atol=1e-11)


def test_spin_block_detection(h2_sto3g):
    h, g = h2_sto3g.integral_tensors()
    assert spin_blocks_consistent(h, g)
    g_bad = g.copy()
    g_bad[0, 0, 0, 1] += 0.1   # r == s pattern break? use spin-flip block
    g_bad[0, 2, 0, 0] += 0.1
    assert not spin_blocks_consistent(h, g_bad)


def test_spatial_equals_spin_orbital_energy(h2_sto3g):
    """The 16x-cheaper spatial path must agree with the reference-semantics
    spin-orbital contraction for arbitrary (non-spin-symmetric) RDMs."""
    h, g = h2_sto3g.integral_tensors()
    h_sp, g_sp = spatial_blocks(h, g)
    rng = np.random.default_rng(7)
    m, n = 2, 1   # spatial dims: 2 -> 1 (active space of 2 spin orbitals)
    u = np.asarray(orth(jnp.asarray(rng.normal(size=(m, n)))))
    N = 2 * n
    gamma = rng.normal(size=(N, N))
    gamma = (gamma + gamma.T) / 2
    Gamma = rng.normal(size=(N, N, N, N))
    gamma_s, Gamma_s = spin_reduce_rdms(jnp.asarray(gamma),
                                        jnp.asarray(Gamma))
    e_fast = float(rotated_energy_spatial(
        jnp.asarray(u), gamma_s, Gamma_s,
        jnp.asarray(h_sp), jnp.asarray(g_sp)))
    e_oracle = float(rotated_energy_so(
        jnp.asarray(u), jnp.asarray(gamma), jnp.asarray(Gamma),
        jnp.asarray(h), jnp.asarray(g)))
    np.testing.assert_allclose(e_fast, e_oracle, atol=1e-10)


def test_expand_spin_tensors_roundtrip(h2_sto3g):
    h, g = h2_sto3g.integral_tensors()
    h_sp, g_sp = spatial_blocks(h, g)
    h2, g2 = expand_spin_tensors(jnp.asarray(h_sp), jnp.asarray(g_sp))
    np.testing.assert_allclose(np.asarray(h2), h, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g2), g, atol=1e-12)


def test_rotated_hamiltonian_identity_rotation(h2_631g):
    """Rotating 6-31G (8 so) down to 4 so with the HF permutation must give
    exactly the Hamiltonian of the first two spatial orbitals."""
    from esoo_tpu.orbital_optimization import OptOrbMinimumEigensolver
    from esoo_tpu.solvers import VQE
    h, g = h2_631g.integral_tensors()
    # restriction oracle: slice spin orbitals {0,1,4,5} -> active {0,1,2,3}
    idx = [0, 1, 4, 5]
    h_act = h[np.ix_(idx, idx)]
    g_act = g[np.ix_(idx, idx, idx, idx)]
    solver = OptOrbMinimumEigensolver.__new__(OptOrbMinimumEigensolver)
    from esoo_tpu.orbital_optimization.base import BaseOptOrbSolver
    BaseOptOrbSolver.__init__(solver, num_spin_orbitals=4,
                              integral_tensors=(h, g))
    H = solver.get_rotated_hamiltonian(solver.initial_partial_unitary)
    th, tg = H.fermionic
    np.testing.assert_allclose(th, h_act, atol=1e-10)
    np.testing.assert_allclose(tg, g_act, atol=1e-10)


def test_kron_sandwich_matches_staged():
    rng = np.random.default_rng(4)
    g = rng.normal(size=(8, 8, 8, 8))
    u = rng.normal(size=(8, 3))
    from esoo_tpu.orbital_optimization.kernels import rotate_two_body_kron
    np.testing.assert_allclose(
        np.asarray(rotate_two_body_kron(jnp.asarray(g), jnp.asarray(u))),
        np.asarray(rotate_two_body(jnp.asarray(g), jnp.asarray(u))),
        atol=1e-11)


def test_torch_tensor_ingestion(h2_631g):
    """Reference API accepts torch tensors for integral_tensors
    (base_opt_orb_solver.py:80-86); ours must too (zero-copy via numpy)."""
    torch = pytest.importorskip("torch")
    from esoo_tpu.orbital_optimization.base import BaseOptOrbSolver
    h, g = h2_631g.integral_tensors()
    solver = BaseOptOrbSolver(
        num_spin_orbitals=4,
        integral_tensors=(torch.from_numpy(h.copy()),
                          torch.from_numpy(g.copy())))
    H = solver.get_rotated_hamiltonian(solver.initial_partial_unitary)
    w = np.linalg.eigvalsh(H.to_matrix())
    assert w[0] < -1.8   # sane active-space ground state
