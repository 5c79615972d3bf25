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


@pytest.mark.slow
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
