"""Unit tests: CIS/CISD state construction (initializations/ci.py).

Expectations from the reference's tests/test_ci_initializations.py:43-84.
"""

import numpy as np

from esoo_tpu.initializations import (ci_matrix, enumerate_determinants,
                                      get_CIS_energies, get_CIS_states,
                                      get_CISD_energies, get_CISD_states)
from esoo_tpu.ops import ActiveSpaceHamiltonianBuilder


def test_cis_energies(h2_sto3g):
    h, g = h2_sto3g.integral_tensors()
    w = get_CIS_energies(h, g, (1, 1))
    np.testing.assert_array_almost_equal(
        w[:3], [-1.83696799, -1.24458455, -0.88272215], decimal=3)


def test_cisd_energies(h2_sto3g):
    h, g = h2_sto3g.integral_tensors()
    w = get_CISD_energies(h, g, (1, 1))
    np.testing.assert_array_almost_equal(
        w[:4], [-1.85727503, -1.24458455, -0.88272215, -0.22491125],
        decimal=3)


def test_ci_matrix_vs_fock_space_oracle(h2_sto3g):
    """Slater-Condon matrix elements == dense Fock-space Hamiltonian
    restricted to the determinant basis (the sign-convention crosscheck)."""
    h, g = h2_sto3g.integral_tensors()
    dets = enumerate_determinants(4, (1, 1), 2)
    H_ci = ci_matrix(dets, h, g)
    H_full = ActiveSpaceHamiltonianBuilder(4).build(h, g).to_matrix()
    H_restricted = np.real(H_full[np.ix_(dets, dets)])
    np.testing.assert_allclose(H_ci, H_restricted, atol=1e-11)


def test_cis_states_measure_cis_energies(h2_sto3g):
    """Dense CIS statevectors reproduce their CI eigenvalues as
    Hamiltonian expectation values (reference test strategy,
    tests/test_ci_initializations.py)."""
    h, g = h2_sto3g.integral_tensors()
    H = ActiveSpaceHamiltonianBuilder(4).build(h, g).to_matrix()
    states = get_CIS_states(h, g, (1, 1), state_representation="dense")
    w = get_CIS_energies(h, g, (1, 1))
    for k in range(3):
        sv = np.asarray(states[k], dtype=complex)
        e = np.real(sv.conj() @ H @ sv)
        np.testing.assert_allclose(e, w[k], atol=1e-10)


def test_cisd_states_orthonormal(h2_sto3g):
    h, g = h2_sto3g.integral_tensors()
    states = get_CISD_states(h, g, (1, 1), state_representation="dense")
    V = np.array(states)
    np.testing.assert_allclose(V @ V.T, np.eye(len(states)), atol=1e-10)


def test_sparse_representation(h2_sto3g):
    h, g = h2_sto3g.integral_tensors()
    sparse = get_CIS_states(h, g, (1, 1), state_representation="sparse")
    dense = get_CIS_states(h, g, (1, 1), state_representation="dense")
    for sd, dd in zip(sparse, dense):
        recon = np.zeros(16)
        for idx, c in sd.items():
            recon[idx] = c
        np.testing.assert_allclose(recon, dd, atol=1e-12)


def test_vectorized_matches_scalar_random():
    """Batch Slater-Condon vs the scalar oracle on random symmetric
    tensors (generic phases, 4-electron sector)."""
    rng = np.random.default_rng(9)
    N = 8
    h = rng.normal(size=(N, N))
    h = (h + h.T) / 2
    g = rng.normal(size=(N, N, N, N))
    g = g + g.transpose(1, 0, 3, 2)
    g = g + g.transpose(2, 3, 0, 1)
    dets = enumerate_determinants(N, (2, 2), 2)
    np.testing.assert_allclose(ci_matrix(dets, h, g, vectorized=True),
                               ci_matrix(dets, h, g, vectorized=False),
                               atol=1e-12)


def test_fci_matches_fock_space_diagonalization(h2_sto3g):
    """Sector FCI (determinant basis) == the right sector eigenvalues of
    the full 2^N Fock-space Hamiltonian matrix."""
    from esoo_tpu.initializations import get_FCI_energies
    from esoo_tpu.ops.hamiltonian import hamiltonian_matrix

    h, g = h2_sto3g.integral_tensors()
    w_fci = get_FCI_energies(h, g, (1, 1))
    mat = hamiltonian_matrix(h, g)
    N = h.shape[0]
    occ = np.array([[(i >> k) & 1 for k in range(N)] for i in range(2 ** N)])
    na = occ[:, : N // 2].sum(axis=1)
    nb = occ[:, N // 2:].sum(axis=1)
    idx = ((na == 1) & (nb == 1)).nonzero()[0]
    w_exact = np.linalg.eigvalsh(mat[np.ix_(idx, idx)])
    np.testing.assert_allclose(w_fci, w_exact, atol=1e-10)
    # the known H2/STO-3G ground state
    np.testing.assert_allclose(w_fci[0], -1.85727503, atol=1e-6)


def test_fci_is_vqe_quality_oracle(h2_631g):
    """FCI in the OptOrb active space equals the exact subspace optimum the
    fused solver converges to."""
    from esoo_tpu.initializations import get_FCI_energies
    from esoo_tpu.orbital_optimization import FusedOptOrbVQE
    from esoo_tpu.orbital_optimization.kernels import (
        expand_spin_tensors, rotated_integrals_spatial)
    import jax.numpy as jnp
    from esoo_tpu.sim import HartreeFock, UCCSD

    ansatz = UCCSD(2, (1, 1), initial_state=HartreeFock(2, (1, 1)))
    r = FusedOptOrbVQE(num_spin_orbitals=4, ansatz=ansatz, problem=h2_631g,
                       maxiter=20).compute_minimum_energy()
    h_sp, g_sp = h2_631g.spatial_integral_tensors()
    h_act, g_act = rotated_integrals_spatial(
        jnp.asarray(r.optimal_partial_unitary, dtype=jnp.float64),
        jnp.asarray(h_sp), jnp.asarray(g_sp))
    h_so, g_so = expand_spin_tensors(h_act, g_act)
    w = get_FCI_energies(np.asarray(h_so), np.asarray(g_so), (1, 1))
    np.testing.assert_allclose(r.eigenvalue, w[0], atol=5e-5)
