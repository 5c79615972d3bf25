"""Spin-orbital CCSD / CCSD(T) (chem/cc.py).

The anchors are exact identities against the package's own machinery:
CCSD == full CI for any two-electron system (machine precision), (T)
vanishes identically there (no triples exist), the spin-orbital HF
energy equals the SCF driver's, and the correlated ladder
MP2 -> CCSD -> CCSD(T) -> FCI tightens monotonically on LiH and H2O.
Reference role: the reference has no correlated classical method."""

import numpy as np
import pytest

from esoo_tpu.chem import MoleculeDriver, ccsd, mp2


@pytest.fixture(scope="module")
def h2_631g():
    return MoleculeDriver("H 0 0 0; H 0 0 0.735", basis="6-31g").run()


def _fci(problem):
    from esoo_tpu.orbital_optimization import FusedOptOrbCASSCF

    return FusedOptOrbCASSCF(
        num_spin_orbitals=2 * problem.num_spatial_orbitals,
        problem=problem, maxiter=1).compute_minimum_energy().eigenvalue


class TestTwoElectronExactness:
    def test_ccsd_equals_fci_and_t_vanishes(self, h2_631g):
        r = ccsd(h2_631g, triples=True)
        assert r["converged"]
        assert r["e_hf"] + r["e_corr"] == pytest.approx(
            _fci(h2_631g), abs=1e-9)
        # no triples exist for 2 electrons: (T) is identically zero
        assert abs(r["e_triples"]) < 1e-14

    def test_hf_energy_matches_scf(self, h2_631g):
        r = ccsd(h2_631g)
        assert r["e_hf"] == pytest.approx(
            h2_631g.scf.energy_electronic, abs=1e-10)

    def test_cc_pvdz_still_exact(self):
        p = MoleculeDriver("H 0 0 0; H 0 0 0.735", basis="cc-pvdz").run()
        r = ccsd(p)
        assert r["e_hf"] + r["e_corr"] == pytest.approx(_fci(p),
                                                        abs=1e-8)


class TestLadder:
    def test_lih_monotone_accuracy(self):
        p = MoleculeDriver("Li 0 0 0; H 0 0 1.60", basis="sto-3g").run()
        e_fci = _fci(p)
        m = mp2(p)
        r = ccsd(p, triples=True)
        e_mp2 = m["e_hf"] + m["e_corr"]
        e_cc = r["e_hf"] + r["e_corr"]
        e_cct = e_cc + r["e_triples"]
        assert abs(e_cc - e_fci) < 0.01 * abs(e_mp2 - e_fci)
        assert abs(e_cct - e_fci) < abs(e_cc - e_fci)
        # variational-side ordering for this system
        assert e_mp2 > e_cc > e_fci - 1e-10

    def test_h2o_beats_mp2(self):
        p = MoleculeDriver(
            "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
            basis="sto-3g").run()
        e_fci = _fci(p)
        m = mp2(p)
        r = ccsd(p)
        assert r["converged"]
        err_cc = abs(r["e_hf"] + r["e_corr"] - e_fci)
        err_mp2 = abs(m["e_hf"] + m["e_corr"] - e_fci)
        assert err_cc < 0.1 * err_mp2
        assert err_cc < 2e-3


class TestOptionsAndIntegration:
    def test_frozen_core_reduces_correlation(self):
        p = MoleculeDriver("Li 0 0 0; H 0 0 1.60", basis="sto-3g").run()
        full = ccsd(p)
        froz = ccsd(p, n_frozen=1)
        assert 0 > froz["e_corr"] > full["e_corr"]

    def test_fcidump_problem(self, h2_631g, tmp_path):
        from esoo_tpu.chem import read_fcidump, write_fcidump

        f = str(tmp_path / "h2.fcidump")
        write_fcidump(h2_631g, f)
        r_file = ccsd(read_fcidump(f))
        r_mem = ccsd(h2_631g)
        assert r_file["e_corr"] == pytest.approx(r_mem["e_corr"],
                                                 abs=1e-10)

    def test_open_shell_h3_doublet(self):
        # ROHF reference, non-canonical equations: the doublet lands on
        # FCI to 1e-9 (3 electrons — connected triples are negligible)
        p = MoleculeDriver("H 0 0 0; H 0 0 0.95; H 0 0 1.90",
                           basis="sto-3g", spin=1).run()
        r = ccsd(p)
        assert r["converged"]
        assert r["e_hf"] == pytest.approx(p.scf.energy_electronic,
                                          abs=1e-10)
        assert r["e_hf"] + r["e_corr"] == pytest.approx(_fci(p),
                                                        abs=1e-9)

    def test_open_shell_li_ladder_and_frozen_core(self):
        p = MoleculeDriver("Li 0 0 0", basis="6-31g", spin=1).run()
        r = ccsd(p, triples=True)
        e_fci = _fci(p)
        err_cc = abs(r["e_hf"] + r["e_corr"] - e_fci)
        err_cct = abs(r["e_hf"] + r["e_corr"] + r["e_triples"] - e_fci)
        assert err_cc < 1e-6
        assert err_cct < err_cc          # (T) tightens
        # freezing the 1s core leaves ONE electron: zero correlation
        rf = ccsd(p, n_frozen=1)
        assert abs(rf["e_corr"]) < 1e-10


class TestSurface:
    def test_h2_ccsd_equilibrium_equals_fci(self):
        # two electrons: the CCSD surface IS the FCI surface, so the
        # optimized bond length must match casscf_energy_fn's to FD
        # tolerance
        from esoo_tpu.chem import (casscf_energy_fn, ccsd_energy_fn,
                                   optimize_geometry)

        r_cc = optimize_geometry("H 0 0 0; H 0 0 0.80",
                                 ccsd_energy_fn(basis="sto-3g"))
        r_fc = optimize_geometry("H 0 0 0; H 0 0 0.80",
                                 casscf_energy_fn(basis="sto-3g"))
        assert r_cc["converged"] and r_fc["converged"]
        d_cc = np.linalg.norm(r_cc["coords"][1] - r_cc["coords"][0])
        d_fc = np.linalg.norm(r_fc["coords"][1] - r_fc["coords"][0])
        np.testing.assert_allclose(d_cc, d_fc, atol=2e-4)
        np.testing.assert_allclose(r_cc["energy"], r_fc["energy"],
                                   atol=1e-8)

    def test_energy_fn_refuses_unconverged(self):
        from esoo_tpu.chem import ccsd_energy_fn

        fn = ccsd_energy_fn(basis="sto-3g", max_iter=2)
        with pytest.raises(RuntimeError, match="did not converge"):
            fn("Li 0 0 0; H 0 0 1.60")
