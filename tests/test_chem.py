"""Integration tests: native integral engine + RHF vs published values."""

import numpy as np
import pytest

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.initializations import ci_matrix, enumerate_determinants


def fci_electronic(problem):
    h, g = problem.integral_tensors()
    dets = enumerate_determinants(problem.num_spin_orbitals,
                                  problem.num_particles, 2)  # FCI for 2 e-
    return np.linalg.eigvalsh(ci_matrix(dets, h, g))[0]


def test_h2_sto3g_scf(h2_sto3g):
    # published RHF/STO-3G total energy for H2 @ 0.735 A
    np.testing.assert_allclose(h2_sto3g.scf.energy_total, -1.116999, atol=2e-5)
    assert h2_sto3g.scf.converged
    np.testing.assert_allclose(h2_sto3g.nuclear_repulsion_energy,
                               0.7199689944489797, atol=1e-9)


def test_h2_631g_scf(h2_631g):
    assert h2_631g.num_spin_orbitals == 8
    np.testing.assert_allclose(h2_631g.scf.energy_total, -1.126809, atol=2e-5)


def test_h2_sto3g_fci(h2_sto3g):
    # reference README.md:95 / tests/test_ssvqe.py:87
    np.testing.assert_allclose(fci_electronic(h2_sto3g), -1.85727503,
                               atol=1e-6)


def test_h2_ccpvtz_fci():
    """Full cc-pVTZ FCI electronic energy vs reference README.md:96."""
    p = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735", basis="cc-pvtz").run()
    assert p.num_spin_orbitals == 56
    np.testing.assert_allclose(fci_electronic(p), -1.89226657, atol=1e-6)


def test_mo_integral_symmetries(h2_sto3g):
    g = h2_sto3g.eri_mo
    np.testing.assert_allclose(g, g.transpose(1, 0, 2, 3), atol=1e-12)
    np.testing.assert_allclose(g, g.transpose(0, 1, 3, 2), atol=1e-12)
    np.testing.assert_allclose(g, g.transpose(2, 3, 0, 1), atol=1e-12)
    S_mo_diag = np.ones(h2_sto3g.num_spatial_orbitals)
    C = h2_sto3g.scf.mo_coeff
    # MO overlap must be identity (orthonormal MOs)
    from esoo_tpu.chem.basis import build_shells, ATOMIC_NUMBERS
    from esoo_tpu.chem.integrals import IntegralEngine
    shells, symbols, coords = build_shells("H 0 0 0; H 0 0 0.735", "sto-3g")
    charges = np.array([ATOMIC_NUMBERS[s] for s in symbols], dtype=float)
    S = IntegralEngine(shells, charges, coords).one_electron()[0]
    np.testing.assert_allclose(C.T @ S @ C,
                               np.eye(C.shape[1]), atol=1e-10)


@pytest.mark.slow
def test_lih_sto3g_consistency():
    """Heteronuclear molecule with p shells: the whole stack must stay
    internally consistent (determinant CI == Fock-space diagonalization,
    OptOrbVQE between active-HF and full-FCI energies)."""
    from esoo_tpu.ops import ActiveSpaceHamiltonianBuilder
    from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
    from esoo_tpu.solvers import VQE, JaxBFGS
    from esoo_tpu.orbital_optimization import (
        OptOrbVQE, PartialUnitaryProjectionOptimizer)
    p = MoleculeDriver(atom="Li 0 0 0; H 0 0 1.5949", basis="sto-3g").run()
    assert p.num_spin_orbitals == 12
    assert p.num_particles == (2, 2)
    h, g = p.integral_tensors()
    e_fci = fci_electronic(p)  # FCI for 4 electrons (max_excitation=2 is
    # not FCI here, but a valid variational CISD bound below HF)
    ansatz = UCCSD(3, (2, 2), initial_state=HartreeFock(3, (2, 2)))
    vqe = VQE(Estimator(), ansatz, JaxBFGS(),
              initial_point=np.zeros(ansatz.num_parameters))
    r = OptOrbVQE(num_spin_orbitals=6, ground_state_solver=vqe,
                  partial_unitary_optimizer=PartialUnitaryProjectionOptimizer(
                      1e-3, 1e-5, 10000),
                  problem=p, maxiter=15).compute_minimum_energy()
    # active-space energy must lie between full-CISD and bare-RHF electronic
    e_rhf_elec = p.scf.energy_electronic
    assert e_fci - 1e-6 <= r.eigenvalue <= e_rhf_elec + 1e-6
    # and improve on the initial (HF-orbital) active space
    assert r.energy_convergence_list[-1] <= r.energy_convergence_list[0] + 1e-10


@pytest.mark.slow
def test_h2_ccpvqz_variational_bounds():
    """cc-pVQZ (120 spin orbitals, f shells): FCI must improve on cc-pVTZ
    variationally and stay above the exact Born-Oppenheimer limit."""
    p = MoleculeDriver(atom="H 0 0 0; H 0 0 0.735", basis="cc-pvqz").run()
    assert p.num_spin_orbitals == 120
    e_qz_total = fci_electronic(p) + p.nuclear_repulsion_energy
    e_tz_total = -1.892266568 + 0.719968994
    assert e_qz_total < e_tz_total          # variational improvement
    assert e_qz_total > -1.1746             # above the exact BO limit


@pytest.mark.slow
def test_h2o_sto3g_optorb():
    """Triatomic with oxygen p shells: RHF vs the literature STO-3G value
    and a reduced-space OptOrbVQE run obeying variational bounds."""
    from esoo_tpu.sim import Estimator, HartreeFock, UCCSD
    from esoo_tpu.solvers import VQE, JaxBFGS
    from esoo_tpu.orbital_optimization import (
        OptOrbVQE, PartialUnitaryProjectionOptimizer)
    p = MoleculeDriver(
        atom="O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g").run()
    # literature RHF/STO-3G at the experimental geometry
    np.testing.assert_allclose(p.scf.energy_total, -74.963, atol=2e-3)
    assert p.num_spin_orbitals == 14 and p.num_particles == (5, 5)
    # 12-spin-orbital active space (frozen-core-like reduction 14 -> 12)
    ansatz = UCCSD(6, (5, 5), initial_state=HartreeFock(6, (5, 5)))
    vqe = VQE(Estimator(), ansatz, JaxBFGS(),
              initial_point=np.zeros(ansatz.num_parameters))
    r = OptOrbVQE(num_spin_orbitals=12, ground_state_solver=vqe,
                  partial_unitary_optimizer=PartialUnitaryProjectionOptimizer(
                      1e-3, 1e-5, 10000),
                  problem=p, maxiter=5).compute_minimum_energy()
    e_rhf_elec = p.scf.energy_electronic
    assert r.eigenvalue <= e_rhf_elec + 1e-8     # at or below RHF
    assert r.energy_convergence_list[-1] <= r.energy_convergence_list[0] + 1e-10
