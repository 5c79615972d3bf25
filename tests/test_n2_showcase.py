"""N2 cc-pVDZ heavier-molecule showcase anchors (round-5 verdict item 4):
the TPU OptOrb path demonstrated past hydrogen — p+d shells, GWH RHF,
frozen core, OptOrb to a 16-spin-orbital window, both eigensolver
families.  Energies are pinned against the repo's own exact
diagonalization (FusedOptOrbCASSCF) and the literature RHF value."""

import numpy as np
import pytest

from esoo_tpu.chem import MoleculeDriver
from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF, FusedOptOrbVQE
from esoo_tpu.sim import HartreeFock, UCCSD


@pytest.fixture(scope="module")
def n2_active():
    p = MoleculeDriver(atom="N 0 0 0; N 0 0 1.0977",
                       basis="cc-pvdz").run()
    # literature RHF/cc-pVDZ total at r = 1.0977 A
    total = p.scf.energy_electronic + p.nuclear_repulsion_energy
    np.testing.assert_allclose(total, -108.954128, atol=2e-5)
    active = p.active_space()          # auto: 2 frozen N 1s cores
    assert active.num_particles == (5, 5)
    assert active.num_spatial_orbitals == 26
    offset = active.core_energy + p.nuclear_repulsion_energy
    return active, offset


def test_n2_optorb_casscf_16so(n2_active):
    """Exact active-space anchor: OptOrb-CASSCF (10e, 8o) recovers
    ~148 mHa of correlation inside the optimized 16-spin-orbital
    window (measured f64, 2026-08-19)."""
    active, offset = n2_active
    r = FusedOptOrbCASSCF(num_spin_orbitals=16, problem=active,
                          maxiter=12,
                          stopping_tolerance=1e-6).compute_minimum_energy()
    np.testing.assert_allclose(r.eigenvalue + offset, -109.102359,
                               atol=5e-4)
    # natural occupations expose the triple-bond correlation structure:
    # three bonding orbitals visibly depleted below 2
    occ = np.sort(np.asarray(r.natural_occupations).ravel())[::-1]
    assert occ[0] > 1.98            # sigma(2s) stays nearly doubly occ
    assert occ[4] < 1.97            # pi/sigma bonding depletion
    assert occ[5:8].sum() > 0.05    # antibonding population


@pytest.mark.slow
def test_n2_optorb_uccsd_16so_near_exact(n2_active):
    """String-UCC at the same shape sits ~1.5 mHa ABOVE the exact
    active-space value (variational, UCCSD-quality at a triple bond) —
    the cross-family consistency anchor for a p-shell molecule."""
    active, offset = n2_active
    cas = FusedOptOrbCASSCF(num_spin_orbitals=16, problem=active,
                            maxiter=12,
                            stopping_tolerance=1e-6
                            ).compute_minimum_energy()
    ansatz = UCCSD(8, active.num_particles,
                   initial_state=HartreeFock(8, active.num_particles))
    ucc = FusedOptOrbVQE(num_spin_orbitals=16, ansatz=ansatz,
                         problem=active, maxiter=10,
                         stopping_tolerance=1e-5,
                         simulation="sector").compute_minimum_energy()
    assert ucc.eigenvalue >= cas.eigenvalue - 1e-6      # variational
    assert (ucc.eigenvalue - cas.eigenvalue) < 3e-3     # UCCSD quality
    np.testing.assert_allclose(ucc.eigenvalue + offset, -109.100871,
                               atol=5e-4)
