"""Closed-shell MP2 (chem/mp2.py): equality with an independent
spin-orbital double-loop oracle, the HF > MP2 > FCI bracketing,
unrelaxed-density sum rules, frozen core, and FCIDUMP-problem
integration (tensors-only path).  Reference role: the reference has no
correlated classical method (PySCF ingestion only,
base_opt_orb_solver.py:87-91)."""

import numpy as np
import pytest

from esoo_tpu.chem import MoleculeDriver, mp2


@pytest.fixture(scope="module")
def h2_631g():
    return MoleculeDriver("H 0 0 0; H 0 0 0.735", basis="6-31g").run()


def _mp2_spin_orbital_oracle(p):
    """E2 = 1/4 Σ |<ij||ab>|^2 / Δ over spin orbitals — independent of
    the vectorized spatial implementation."""
    h = np.asarray(p.hcore_mo)
    eri = np.asarray(p.eri_mo)
    n = h.shape[0]
    nocc = p.num_particles[0]
    F = (h + 2 * np.einsum("pqjj->pq", eri[:, :, :nocc, :nocc])
         - np.einsum("pjjq->pq", eri[:, :nocc, :nocc, :]))
    eps = np.diag(F)
    occ = [(i, s) for i in range(nocc) for s in (0, 1)]
    virt = [(a, s) for a in range(nocc, n) for s in (0, 1)]

    def phys(P, Q, R, S):
        # <PQ|RS> physicist = (PR|QS) chemist with spin deltas
        if P[1] == R[1] and Q[1] == S[1]:
            return eri[P[0], R[0], Q[0], S[0]]
        return 0.0

    e2 = 0.0
    for I in occ:
        for J in occ:
            for A in virt:
                for B in virt:
                    anti = phys(I, J, A, B) - phys(I, J, B, A)
                    d = eps[I[0]] + eps[J[0]] - eps[A[0]] - eps[B[0]]
                    e2 += 0.25 * anti * anti / d
    return e2


class TestEnergy:
    def test_matches_spin_orbital_oracle(self, h2_631g):
        r = mp2(h2_631g)
        assert r["e_corr"] == pytest.approx(
            _mp2_spin_orbital_oracle(h2_631g), abs=1e-12)

    def test_lih_oracle_and_frozen_core(self):
        p = MoleculeDriver("Li 0 0 0; H 0 0 1.60", basis="sto-3g").run()
        r = mp2(p)
        assert r["e_corr"] == pytest.approx(
            _mp2_spin_orbital_oracle(p), abs=1e-12)
        rf = mp2(p, n_frozen=1)
        # freezing the Li 1s removes part of the correlation
        assert 0 > rf["e_corr"] > r["e_corr"]
        # frozen rows of the density stay exactly doubly occupied
        assert rf["one_rdm_spatial"][0, 0] == pytest.approx(2.0,
                                                            abs=1e-14)

    def test_bracketed_by_hf_and_fci(self, h2_631g):
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        r = mp2(h2_631g)
        fci = FusedOptOrbCASSCF(
            num_spin_orbitals=2 * h2_631g.num_spatial_orbitals,
            problem=h2_631g, maxiter=1).compute_minimum_energy()
        assert r["e_hf"] > r["e_hf"] + r["e_corr"] > fci.eigenvalue

    def test_total_energy_constants(self, h2_631g):
        r = mp2(h2_631g)
        assert r["e_total"] == pytest.approx(
            r["e_hf"] + r["e_corr"]
            + h2_631g.nuclear_repulsion_energy, abs=1e-12)


class TestDensity:
    def test_sum_rules_and_no_occupations(self, h2_631g):
        r = mp2(h2_631g)
        g = r["one_rdm_spatial"]
        assert np.trace(g) == pytest.approx(2.0, abs=1e-12)
        np.testing.assert_allclose(g, g.T, atol=1e-14)
        occ = r["natural_occupations"]
        assert np.all(np.diff(occ) <= 1e-12)
        assert occ.sum() == pytest.approx(2.0, abs=1e-12)
        assert np.all(occ > -1e-10) and np.all(occ < 2.0 + 1e-10)

    def test_mp2_nos_track_fci_correlation(self, h2_631g):
        # the MP2-NO spectrum identifies the same correlating orbital
        # FCI does (the sigma_u* partner) — the active-space selection
        # use case
        from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

        r = mp2(h2_631g)
        fci = FusedOptOrbCASSCF(num_spin_orbitals=4, problem=h2_631g,
                                maxiter=15).compute_minimum_energy()
        # leading correlating NO occupation within 40% of FCI's
        np.testing.assert_allclose(r["natural_occupations"][1],
                                   fci.natural_occupations[1],
                                   rtol=0.6)


class TestIntegration:
    def test_works_on_fcidump_problem(self, h2_631g, tmp_path):
        # tensors-only problems (no scf attached) must work: orbital
        # energies are rebuilt from the Fock diagonal
        from esoo_tpu.chem import read_fcidump, write_fcidump

        f = str(tmp_path / "h2.fcidump")
        write_fcidump(h2_631g, f)
        p = read_fcidump(f)
        assert p.scf is None
        r_file = mp2(p)
        r_mem = mp2(h2_631g)
        assert r_file["e_corr"] == pytest.approx(r_mem["e_corr"],
                                                 abs=1e-12)

    def test_open_shell_rejected(self):
        p = MoleculeDriver("H 0 0 0; H 0 0 0.95; H 0 0 1.90",
                           basis="sto-3g", spin=1).run()
        with pytest.raises(ValueError, match="closed-shell"):
            mp2(p)

    def test_frozen_out_of_range(self, h2_631g):
        with pytest.raises(ValueError, match="n_frozen"):
            mp2(h2_631g, n_frozen=1)
